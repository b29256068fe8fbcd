package graft.model

import org.apache.spark.sql.types._

/** Typed event record mirroring the reference's nullable-everything
  * payload contract (`consumer2/.../data/IngestedData.kt:7-16`;
  * schema FIXTURES.md §1): every field optional, unknown JSON keys
  * ignored (PERMISSIVE parse), timestamp carried as ISO-8601 string
  * and parsed in the engine (SURVEY.md §2 P7 — the reference defers
  * this to ClickHouse, we do it in Spark via `to_timestamp`).
  */
case class IngestedEvent(
    sensorId: Option[String],
    temperature: Option[Double],
    timestamp: Option[String],
    value: Option[Int],
    message: Option[String])

object IngestedEvent {
  /** The `from_json` parse schema (field order is the declared
    * projection order, `ClickHouseWriterService.kt:107-119`).
    */
  val schema: StructType = StructType(Seq(
    StructField("sensorId", StringType, nullable = true),
    StructField("temperature", DoubleType, nullable = true),
    StructField("timestamp", StringType, nullable = true),
    StructField("value", IntegerType, nullable = true),
    StructField("message", StringType, nullable = true)))
}
