package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import scala.util.{Failure, Success, Try}

import graft.SparkSpec

/** Mirrors the reference's `auth_test.go` CachingAuthenticator matrix
  * (hit / miss / error-not-cached / LRU-eviction-at-size-2 /
  * TTL-expiry / cache-disabled) against [[LruTtlCache]] +
  * [[CachingLookup]], with a deterministic clock instead of sleeps,
  * plus one distributed test proving the per-partition memoization
  * shape inside `mapPartitions`.
  */
class LruTtlCacheSpec extends SparkSpec {

  private def counting(valid: Set[String], calls: AtomicInteger,
                       fail: Boolean = false): String => Try[Boolean] =
    k => {
      calls.incrementAndGet()
      if (fail) Failure(new RuntimeException("database is down"))
      else Success(valid(k))
    }

  test("cache hit: underlying lookup runs once per key within TTL") {
    val calls = new AtomicInteger
    val look = CachingLookup(counting(Set("key-one"), calls), 2, 60000L)
    assert(look("key-one") === Success(true))
    assert(look("key-one") === Success(true))
    assert(calls.get === 1)
  }

  test("negative results are cached too (invalid key is a result, not an error)") {
    val calls = new AtomicInteger
    val look = CachingLookup(counting(Set.empty, calls), 2, 60000L)
    assert(look("key-one") === Success(false))
    assert(look("key-one") === Success(false))
    assert(calls.get === 1)
  }

  test("errors are never cached: each call reaches the backend") {
    val calls = new AtomicInteger
    val look = CachingLookup(counting(Set.empty, calls, fail = true), 2, 60000L)
    assert(look("key-one").isFailure)
    assert(look("key-one").isFailure)
    assert(calls.get === 2)
  }

  test("LRU eviction at size 2: a read refreshes recency, eldest goes") {
    val calls = new AtomicInteger
    val look = CachingLookup(counting(Set("key-one", "key-three"), calls), 2, 0L)
    look("key-one") // miss → cached        [one]
    look("key-two") // miss → cached        [one, two]
    look("key-one") // HIT → refreshes      [two, one]
    assert(calls.get === 2)
    look("key-three") // miss → evicts two  [one, three]
    assert(calls.get === 3)
    assert(look("key-one") === Success(true)) // still a hit
    assert(calls.get === 3)
    look("key-two") // evicted → backend again
    assert(calls.get === 4)
  }

  test("TTL expiry forces a re-lookup (deterministic clock, no sleeps)") {
    var now = 0L
    val calls = new AtomicInteger
    val look = CachingLookup(counting(Set("key-one"), calls), 2, 100L, () => now)
    assert(look("key-one") === Success(true))
    now = 99L
    assert(look("key-one") === Success(true))
    assert(calls.get === 1, "inside TTL: cached")
    now = 100L
    assert(look("key-one") === Success(true))
    assert(calls.get === 2, "at TTL: expired, re-fetched")
  }

  test("size <= 0 disables caching and returns the undecorated lookup") {
    val calls = new AtomicInteger
    val next = counting(Set("key-one"), calls)
    val look = CachingLookup(next, 0, 1000L)
    assert(look eq next, "the original function comes back, like the reference's size guard")
    look("key-one"); look("key-one")
    assert(calls.get === 2)
  }

  test("per-partition memoization inside mapPartitions: one backend call per distinct key per partition") {
    import spark.implicits._
    val backendCalls = spark.sparkContext.longAccumulator("backend")
    // 4 partitions × 100 rows over 5 distinct keys
    val out = spark.range(400).repartition(4)
      .map(i => s"key-${i % 5}")
      .mapPartitions { it =>
        // one cache per partition — the executor-local tier; the
        // backend accumulator counts actual lookups
        val look = CachingLookup(
          (k: String) => { backendCalls.add(1L); Success(k.last.toInt % 2 == 0) },
          maxEntries = 10, ttlMs = 0L)
        it.map(k => look(k).get)
      }
      .collect()
    assert(out.length === 400)
    assert(backendCalls.value <= 4L * 5L,
      s"at most distinct-keys-per-partition lookups, got ${backendCalls.value}")
    assert(backendCalls.value >= 5L)
  }
}
