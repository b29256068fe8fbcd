package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe — the native replacement
  * for a broadcast-plus-UDF probe. Reuses Spark's OWN
  * [[BloomFilterMightContain]] (the expression behind AQE's runtime
  * row-level join filtering, `InjectRuntimeFilter`), feeding it the
  * serialized sketch as a foldable binary literal: the expression
  * deserializes once per task and its `doGenCode` keeps the probe
  * inside whole-stage codegen, where a Scala UDF would force an
  * interpreted boundary.
  *
  * The literal embeds the sketch in the plan (fine for
  * dimension-sized filters — tens of KB to a few MB). A corpus whose
  * filter runs to GBs would thread the bytes through a broadcast
  * variable instead; at that point Spark's own runtime filtering is
  * usually already doing this job.
  */
object BloomProbe {

  /** Serialize a built sketch to the wire format
    * [[BloomFilterMightContain]] deserializes (`BloomFilter.readFrom`
    * — both ends are `org.apache.spark.util.sketch`).
    */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** `might_contain(bloom, value)` over a LongType column. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      ExpressionUtils.expression(value)))
}
