package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the faithful
  * mapping of the reference's per-key LRU+TTL auth cache
  * (`publisher/internal/auth/caching.go:26-80`) when true per-key
  * semantics are demanded (SURVEY §2.5 D4's "if demanded" branch;
  * the dimension-refresh broadcast in [[RefreshingBroadcast]] is the
  * default, cheaper mapping).
  *
  * State is bounded by the processing-time timeout: a key's entry
  * lives for `ttlMs` after its last refresh, then Spark reaps it —
  * the streaming analog of the cache's TTL eviction. At scale, state
  * is hash-partitioned by key across executors and checkpointed
  * incrementally (RocksDB state store in production configs).
  */
object KeyedState {

  /** Streaming first-seen-wins dedup: the first record of each key
    * passes; repeats within the TTL are dropped; after the TTL the
    * key is forgotten and may pass again. `ttlMs <= 0` keeps state
    * forever (no timeout) — use only for bounded key spaces.
    *
    * The state value is the ADMIT TIMESTAMP, and the data branch
    * checks it against the clock: Spark only fires the timeout
    * callback for keys with NO data in the trigger, so a key whose
    * repeats keep arriving would otherwise be suppressed forever
    * instead of re-admitted every `ttlMs` (review-caught — the
    * timeout alone only reaps IDLE keys).
    */
  /** The per-group transition, factored out so the TTL arithmetic is
    * unit-testable against `TestGroupState` with a deterministic
    * clock (a live ProcessingTimeTimeout query can't be driven
    * deterministically in a test harness — see KeyedStateSpec).
    */
  private[streaming] def dedupeTransition[T](
      rows: Iterator[T], state: GroupState[Long], ttlMs: Long): Iterator[T] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val now =
        if (ttlMs > 0) state.getCurrentProcessingTimeMs() else 0L
      val expired =
        ttlMs > 0 && state.exists && now - state.get >= ttlMs
      if (state.exists && !expired) {
        Iterator.empty // seen within TTL → drop
      } else {
        state.update(now)
        if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
        rows.take(1)
      }
    }

  def dedupeByKey[T: Encoder](ds: Dataset[T], key: T => String,
                              ttlMs: Long): Dataset[T] = {
    import ds.sparkSession.implicits._
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(key)
      .flatMapGroupsWithState[Long, T](OutputMode.Append(), timeout) {
        (_: String, rows: Iterator[T], state: GroupState[Long]) =>
          dedupeTransition(rows, state, ttlMs)
      }
  }
}
