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

  /** @param left      left rows; all its columns survive
    * @param right     right rows: key, time, payload columns
    * @param leftKey/rightKey   equi-join key columns
    * @param leftTime/rightTime numeric (e.g. epoch micros) time columns
    * @param payload   right columns to attach (null when no match)
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
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
}
