package graft.streaming

import scala.util.{Failure, Success, Try}

/** In-process LRU + TTL cache — the faithful model of the reference's
  * `expirable.LRU` auth-cache decorator
  * (`publisher/internal/auth/caching.go:26-80`): at most `maxEntries`
  * entries with least-recently-USED eviction on overflow (a read
  * refreshes recency), per-entry TTL expiry, and — via
  * [[CachingLookup]] — lookup failures never cached and
  * `maxEntries <= 0` disabling caching entirely.
  *
  * Placement in the engine: this is the EXECUTOR-LOCAL memoization
  * tier a `mapPartitions`/`foreachBatch` body puts in front of a
  * remote lookup (auth service, dimension store) — one instance per
  * partition or per executor, never cluster-shared. The cluster-wide
  * analogs remain [[RefreshingBroadcast]] (dimension refresh
  * broadcast) and [[KeyedState]] (checkpointed per-key streaming
  * state, TTL-reaped): Spark state cannot express a GLOBAL
  * max-entries LRU because keys are hash-partitioned and cannot see
  * each other's recency — the size bound is only meaningful
  * process-locally, which is exactly where the reference holds it
  * too (one cache per publisher process).
  *
  * Synchronized: an executor may run several task threads through a
  * shared instance; the footprint is `maxEntries` — bounded by
  * construction, like the reference's.
  *
  * @param clock injectable millisecond clock so TTL behavior is
  *              deterministic under test (the reference sleeps real
  *              wall-clock in `auth_test.go`; we don't have to)
  */
final class LruTtlCache[K, V](maxEntries: Int, ttlMs: Long,
                              clock: () => Long = () => System.currentTimeMillis()) {
  require(maxEntries > 0, "use CachingLookup for the size<=0 'caching disabled' path")

  private case class Entry(value: V, at: Long)

  // accessOrder = true: iteration order is recency, so the eldest
  // entry IS the least-recently-used one — eviction is O(1)
  private val map = new java.util.LinkedHashMap[K, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Entry]): Boolean =
      size() > maxEntries
  }

  /** Some(value) and a recency refresh on a live hit; None (and
    * eager removal) for missing or TTL-expired entries.
    */
  def get(k: K): Option[V] = this.synchronized {
    val e = map.get(k)
    if (e == null) None
    else if (ttlMs > 0 && clock() - e.at >= ttlMs) {
      map.remove(k)
      None
    } else Some(e.value)
  }

  def put(k: K, v: V): Unit = this.synchronized {
    map.put(k, Entry(v, clock()))
    ()
  }

  def currentSize: Int = this.synchronized(map.size())
}

/** The decorator shape of the reference's `CachingAuthenticator`:
  * wrap a fallible lookup with an [[LruTtlCache]]. Successful
  * results (INCLUDING negative ones — an invalid key is a result,
  * not an error) are cached; `Failure`s pass through uncached so a
  * transient backend outage never poisons the cache; `maxEntries <=
  * 0` returns the undecorated lookup (caching disabled, same as
  * `NewCachingAuthenticator`'s size guard).
  *
  * Like the reference decorator, the miss path is deliberately NOT
  * single-flight: threads racing on the same cold key each reach
  * the backend (`ValidateAPIKey` has the identical check-then-Add
  * window). Duplicate reads are benign for the idempotent lookups
  * this fronts; put a per-key latch in front if a backend can't
  * tolerate cold-key bursts.
  */
object CachingLookup {
  def apply[K, V](next: K => Try[V], maxEntries: Int, ttlMs: Long,
                  clock: () => Long = () => System.currentTimeMillis()): K => Try[V] = {
    if (maxEntries <= 0) next
    else {
      val cache = new LruTtlCache[K, V](maxEntries, ttlMs, clock)
      (k: K) =>
        cache.get(k) match {
          case Some(v) => Success(v)
          case None =>
            next(k) match {
              case s @ Success(v) => cache.put(k, v); s
              case f @ Failure(_) => f
            }
        }
    }
  }
}
