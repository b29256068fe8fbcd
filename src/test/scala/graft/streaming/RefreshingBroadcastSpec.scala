package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** D4 cache-semantics matrix, mirroring `auth_test.go:26-170`
  * (hit, TTL expiry, error-not-cached, disabled cache) with an
  * injectable clock instead of sleeps.
  */
class RefreshingBroadcastSpec extends AnyFunSuite {

  private class Clock(var now: Long = 0L) { def apply(): Long = now }

  test("within TTL the loader runs once (cache hit)") {
    val clock = new Clock()
    var loads = 0
    val rb = new RefreshingBroadcast(() => { loads += 1; s"v$loads" }, 1000L, () => clock())
    assert(rb.get() === "v1")
    clock.now = 999
    assert(rb.get() === "v1")
    assert(rb.loadCount === 1)
  }

  test("after TTL the value is reloaded (staleness <= TTL)") {
    val clock = new Clock()
    var loads = 0
    val rb = new RefreshingBroadcast(() => { loads += 1; s"v$loads" }, 1000L, () => clock())
    assert(rb.get() === "v1")
    clock.now = 1000
    assert(rb.get() === "v2")
    assert(rb.loadCount === 2)
  }

  test("errors are never cached; previous value survives until a load succeeds") {
    val clock = new Clock()
    var fail = false
    var loads = 0
    val rb = new RefreshingBroadcast(() => {
      if (fail) sys.error("db down"); loads += 1; s"v$loads"
    }, 1000L, () => clock())
    assert(rb.get() === "v1")
    clock.now = 2000
    fail = true
    intercept[RuntimeException] { rb.get() }
    fail = false
    assert(rb.get() === "v2") // recovered; error never became a cached value
  }

  test("ttl <= 0 disables caching (every get reloads)") {
    var loads = 0
    val rb = new RefreshingBroadcast(() => { loads += 1; loads }, 0L)
    assert(rb.get() === 1)
    assert(rb.get() === 2)
  }

  test("invalidate forces a reload before the TTL") {
    val clock = new Clock()
    val rb = new RefreshingBroadcast(() => clock.now, 1000L, () => clock())
    assert(rb.get() === 0L)
    rb.invalidate()
    clock.now = 1
    assert(rb.get() === 1L)
  }
}
