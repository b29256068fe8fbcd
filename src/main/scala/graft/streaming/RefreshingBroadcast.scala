package graft.streaming

/** D4: the TTL-refreshed auth dimension — the Spark analog of the
  * reference's LRU+TTL auth cache
  * (`publisher/internal/auth/caching.go:26-80`).
  *
  * The reference caches per-key lookups; in Spark the whole (small)
  * dimension is the cached unit: re-load it at most every `ttlMs` and
  * let the join broadcast it. Staleness is bounded by the TTL exactly
  * like the reference (`publisher/README.md:35-41`).
  *
  * Reference semantics preserved:
  *  - results (the loaded dimension) are cached; ERRORS are never
  *    cached (`caching.go:66-73`) — within the TTL the cached value
  *    is served; once it expires, a failing reload PROPAGATES to the
  *    caller (the stale value is NOT silently served past its TTL —
  *    the same fail-the-request behavior as the reference when the
  *    expired entry forces a store lookup that errors) and the next
  *    get() retries the load;
  *  - ttl ≤ 0 disables caching (`caching.go:30-33`: size ≤ 0 returns
  *    the undecorated authenticator) — every get() reloads.
  *
  * The clock is injectable for deterministic TTL tests
  * (`auth_test.go:26-170` sleeps; we don't have to).
  */
class RefreshingBroadcast[T](load: () => T, ttlMs: Long,
                             clock: () => Long = () => System.currentTimeMillis()) {

  @volatile private var cached: Option[(T, Long)] = None
  @volatile private var loads: Long = 0L

  /** The current value, reloading if absent or older than the TTL. */
  def get(): T = synchronized {
    val now = clock()
    cached match {
      case Some((v, at)) if ttlMs > 0 && now - at < ttlMs => v
      case _ =>
        val v = load() // errors propagate uncached
        loads += 1
        cached = Some((v, now))
        v
    }
  }

  /** Force the next [[get]] to reload. */
  def invalidate(): Unit = synchronized { cached = None }

  /** How many times the loader actually ran (test observability). */
  def loadCount: Long = loads
}
