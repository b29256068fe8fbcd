package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** AS-OF join: for each left row, attach the most recent right row
  * with the same key and right.time <= left.time — the canonical
  * "latest quote for this trade" / "latest dimension version for
  * this event" operator that Spark has no built-in for.
  *
  * Implementation (preference (a) of the custom-operator ladder —
  * composed from existing operators): UNION both sides on a common
  * time axis, then one window pass per key carries the latest right
  * payload forward (`last(..., ignoreNulls)` over rows unbounded
  * preceding), then keep the left rows. Cost: ONE shuffle of
  * left+right by key + a per-key sort — same order as the
  * sort-merge join Spark would need anyway, versus the naive
  * range-join that explodes to |left|×|right-per-key| intermediate
  * rows.
  *
  * Rights sort BEFORE lefts at equal timestamps, so the match is
  * inclusive (right.time == left.time matches), like DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t`. Right (key, time) pairs must be
  * unique for determinism — pre-aggregate if needed.
  */
object AsOfJoin {

  private val Reserved =
    Seq("_k", "_t", "_b", "_ord", "_is_right", "_payload_r", "_payload", "_p")

  /** Both operators stage through underscore-prefixed temp columns; a
    * user column with one of those names would be silently
    * overwritten and returned corrupted — fail loudly instead
    * (review-caught).
    */
  private def checkReserved(df: DataFrame, side: String): Unit = {
    val clash = df.columns.toSeq.intersect(Reserved)
    require(clash.isEmpty,
      s"$side side uses reserved AsOfJoin column name(s) ${clash.mkString(", ")} — rename before joining")
  }

  /** A right row with a NULL time can never match (DuckDB ASOF's
    * `l.t >= NULL` is never true) — but an ascending NULLS FIRST sort
    * would place it before every real row and back-fill it into
    * early lefts (review-caught). Drop such rows up front.
    */
  private def droppedNullTimes(right: DataFrame, rightTime: String): DataFrame =
    right.filter(col(rightTime).isNotNull)

  /** @param left      left rows; all its columns survive
    * @param right     right rows: key, time, payload columns
    * @param leftKey/rightKey   equi-join key columns
    * @param leftTime/rightTime numeric (e.g. epoch micros) time columns
    * @param payload   right columns to attach (null when no match)
    */
  def asOf(left: DataFrame, rawRight: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    checkReserved(left, "left")
    checkReserved(rawRight, "right")
    val right = droppedNullTimes(rawRight, rightTime)
    val leftCols = left.columns.toSeq
    // The payload travels as ONE struct so the matched right row
    // attaches ATOMICALLY: carrying each column through its own
    // last(..., ignoreNulls) would back-fill a NULL field of the
    // matched row from an OLDER right row, silently mixing values
    // from different rows (true AS-OF semantics — and DuckDB's
    // ASOF JOIN — keep the matched row's NULLs).
    val payloadType = StructType(payload.map(p => right.schema(p)))
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_is_right", lit(0))
      .select((Seq(col("_k"), col("_t"), col("_is_right")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadType).as("_payload_r")): _*)
    val r = right
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      .withColumn("_is_right", lit(1))
      .select((Seq(col("_k"), col("_t"), col("_is_right")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("_payload_r")): _*)

    // rights first at equal time → inclusive match
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_payload", last(col("_payload_r"), ignoreNulls = true).over(w))
      .filter(col("_is_right") === 0)
      .select((leftCols.map(col) ++
        payload.map(p => col("_payload." + p).as(p))): _*)
  }

  /** [[asOf]] for SKEWED keys: identical semantics, but no partition
    * ever holds more than one (key, time-bucket) of data.
    *
    * [[asOf]]'s single window puts ALL rows of a key in one
    * partition — the right call for high-cardinality keys (each
    * partition holds many small key groups), a scale-killer for the
    * few-keys × billions-of-rows shape (5 symbols of tick data). Here
    * the time axis is cut into `bucketWidth` buckets and the join
    * runs in three bounded phases:
    *
    *  1. per (key, bucket): the LAST right row of the bucket — a
    *     map-side-combinable `max_by` aggregate, never a sort;
    *  2. per key over the (key, bucket) spine: carry the latest
    *     bucket-final payload into each bucket from STRICTLY earlier
    *     buckets — a window over |time-range / bucketWidth| rows per
    *     key, independent of data volume;
    *  3. per (key, bucket): the [[asOf]] union+window pass, seeded
    *     with the carry-in row at the bucket floor — partitions are
    *     bounded by one bucket of one key, so `bucketWidth` is a
    *     direct knob on partition size.
    *
    * At equal timestamps the order is carry-in, then real right, then
    * left: a real right row at the bucket floor overrides the (older)
    * carry, and lefts match inclusively, exactly as in [[asOf]].
    */
  def asOfBucketed(left: DataFrame, rawRight: DataFrame,
                   leftKey: String, leftTime: String,
                   rightKey: String, rightTime: String,
                   payload: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    checkReserved(left, "left")
    checkReserved(rawRight, "right")
    val right = droppedNullTimes(rawRight, rightTime)
    val leftCols = left.columns.toSeq
    val payloadType = StructType(payload.map(p => right.schema(p)))
    // exact integer floor-division: `floor(t / W)` would route through
    // DOUBLE and mis-bucket near boundaries once t exceeds 2^53
    // (epoch NANOS). pmod-subtract makes the dividend an exact
    // multiple, so decimal division is exact and floor == truncate
    // for negatives too.
    val bucket = (t: Column) => {
      val tl = t.cast("long")
      ((tl - pmod(tl, lit(bucketWidth))).cast("decimal(38,0)") /
        lit(bucketWidth)).cast("long")
    }

    // 1. last right row per (key, bucket): max_by on the time — the
    // payload travels inside the struct, so it attaches atomically
    val rb = right.select(
      col(rightKey).as("_k"), bucket(col(rightTime)).as("_b"),
      col(rightTime).cast("long").as("_t"),
      struct(payload.map(col): _*).as("_p"))
    val bucketFinal = rb
      .groupBy(col("_k"), col("_b"))
      .agg(max(struct(col("_t"), col("_p"))).as("_last"))
      .select(col("_k"), col("_b"), col("_last._p").as("_p"))

    // 2. carry-in per (key, bucket) over the spine of buckets present
    // on EITHER side (left-only buckets still need the carry): latest
    // bucket-final from strictly earlier buckets
    val spine = left.select(col(leftKey).as("_k"), bucket(col(leftTime)).as("_b"))
      .union(rb.select(col("_k"), col("_b")))
      .distinct()
    val wCarry = Window.partitionBy(col("_k")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine
      .join(bucketFinal, Seq("_k", "_b"), "left")
      .withColumn("_carry", last(col("_p"), ignoreNulls = true).over(wCarry))
      .filter(col("_carry").isNotNull)
      .select(col("_k"), col("_b"), col("_carry"))

    // 3. the asOf union+window pass, per (key, bucket), seeded with
    // the carry row at the bucket floor. _ord at equal times:
    // carry(2) before right(1) before left(0).
    val l = left.select((Seq(
      col(leftKey).as("_k"), bucket(col(leftTime)).as("_b"),
      col(leftTime).cast("long").as("_t"), lit(0).as("_ord"),
      lit(null).cast(payloadType).as("_payload_r")) ++ leftCols.map(col)): _*)
    val r = rb.select((Seq(
      col("_k"), col("_b"), col("_t"), lit(1).as("_ord"),
      col("_p").as("_payload_r")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val c = carry.select((Seq(
      col("_k"), col("_b"), (col("_b") * bucketWidth).as("_t"), lit(2).as("_ord"),
      col("_carry").as("_payload_r")) ++
      leftCols.map(cn => lit(null).cast(left.schema(cn).dataType).as(cn))): _*)

    val w = Window.partitionBy(col("_k"), col("_b"))
      .orderBy(col("_t").asc, col("_ord").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r).unionByName(c)
      .withColumn("_payload", last(col("_payload_r"), ignoreNulls = true).over(w))
      .filter(col("_ord") === 0)
      .select((leftCols.map(col) ++
        payload.map(p => col("_payload." + p).as(p))): _*)
  }
}
