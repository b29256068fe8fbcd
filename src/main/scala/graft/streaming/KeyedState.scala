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
    */
  def dedupeByKey[T: Encoder](ds: Dataset[T], key: T => String,
                              ttlMs: Long): Dataset[T] = {
    import ds.sparkSession.implicits._
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](OutputMode.Append(), timeout) {
        (_: String, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // seen within TTL → drop
          } else {
            state.update(true)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            rows.take(1)
          }
      }
  }
}
