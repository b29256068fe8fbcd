package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model.IngestedEvent

/** Parse/admission/auth matrices from FIXTURES.md §4-§7, mirroring the
  * reference's test suites (`MessageProcessorTest.kt:30-128`,
  * `handler_test.go:60-142`,
  * `ClickHouseRepositoryIntegrationTest.kt` NULL assertions).
  */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  // FIXTURES §4: valid payloads (parse → insert expected)
  private val validPayloads = Seq(
    """{"sensorId": "A1", "temperature": 25.5}""",
    """{"sensorId": "B2", "message": "OK"}""",
    """{"sensorId": "C3", "value": 99}""",
    """{"sensorId": "sensor1", "temperature": 10.1, "timestamp": "2023-01-01T10:00:00Z"}""",
    """{"sensorId": "sensor2", "value": 50, "message": "Data point"}""",
    """{"message": "hello", "value": 42}""")

  // FIXTURES §5: null-handling payloads
  private val nullPayloads = Seq(
    """{"sensorId": "sensor_null", "message": "Temp missing"}""",
    """{"value": 123}""")

  // FIXTURES §6: malformed payloads (drop/divert expected)
  private val malformedPayloads = Seq(
    """{"sensorId": "D4", "value":}""",
    """{"sensorId": "F6",,}""",
    """{"sensorId": "G7"}invalid""",
    """{"message": "hello",""",
    "")

  private def rawDf(payloads: Seq[String]) =
    payloads.zipWithIndex
      .map { case (p, i) => (i.toLong, p) }
      .toDF("event_id", "props")

  private def parse(payloads: Seq[String]) =
    IngestPipeline.parse(rawDf(payloads), schema = IngestedEvent.schema)

  test("all valid payloads are admitted, none diverted (MessageProcessorTest all-valid)") {
    val parsed = parse(validPayloads ++ nullPayloads)
    assert(IngestPipeline.admitted(parsed).count() === 8)
    assert(IngestPipeline.rejectedMalformed(parsed).count() === 0)
  }

  test("malformed payloads are diverted, not admitted (F4/F5/F6)") {
    val parsed = parse(malformedPayloads)
    assert(IngestPipeline.admitted(parsed).count() === 0)
    assert(IngestPipeline.rejectedMalformed(parsed).count() === malformedPayloads.size.toLong)
  }

  test("mixed batch splits exactly (MessageProcessorTest mixed case)") {
    val parsed = parse(validPayloads ++ malformedPayloads)
    assert(IngestPipeline.admitted(parsed).count() === validPayloads.size.toLong)
    assert(IngestPipeline.rejectedMalformed(parsed).count() === malformedPayloads.size.toLong)
  }

  test("null payload is diverted (F3 empty-body reject)") {
    val df = Seq((0L, null: String), (1L, """{"value": 1}""")).toDF("event_id", "props")
    val parsed = IngestPipeline.parse(df, schema = IngestedEvent.schema)
    assert(IngestPipeline.admitted(parsed).count() === 1)
    assert(IngestPipeline.rejectedMalformed(parsed).count() === 1)
  }

  test("missing JSON keys decode to SQL NULLs (null roundtrip, P5)") {
    val parsed = parse(nullPayloads)
    val rows = IngestPipeline.admitted(parsed)
      .select($"parsed.sensorId", $"parsed.temperature", $"parsed.value", $"parsed.message")
      .orderBy($"event_id")
      .collect()
    assert(rows(0) === Row("sensor_null", null, null, "Temp missing"))
    assert(rows(1) === Row(null, null, 123, null))
  }

  test("unknown JSON keys are ignored, known ones still bind (lenient parse)") {
    val parsed = parse(Seq("""{"sensorId": "X", "unknownKey": true, "another": [1,2]}"""))
    val rows = IngestPipeline.admitted(parsed).select($"parsed.sensorId").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("X"))
  }

  test("auth matrix: valid key accepted, inactive and unknown rejected (handler_test.go:60-142)") {
    val events = Seq(
      (1L, "valid-key-123"), // active → 202 path
      (2L, "inactive-key"),  // present but inactive → 401
      (3L, "never-seen"),    // unknown → 401
      (4L, null: String)     // missing header → 401 (F1)
    ).toDF("event_id", "user_id")
    // FIXTURES §3 seed rows
    val keys = Seq(("valid-key-123", true), ("inactive-key", false))
      .toDF("key", "is_active")
      .filter($"is_active")
      .select($"key".as("api_key"))
    assert(IngestPipeline.validated(events, keys).select("event_id").as[Long].collect().toSeq === Seq(1L))
    assert(IngestPipeline.rejectedAuth(events, keys).select("event_id").as[Long].collect().sorted.toSeq === Seq(2L, 3L, 4L))
  }

  test("enriched projects the declared column order with injected receivedAt (P1/P3)") {
    val df = Seq((7L, 42L, "click", 1.5, """{"k": 3}"""))
      .toDF("event_id", "user_id", "event_type", "value", "props")
    val out = IngestPipeline.enriched(IngestPipeline.parse(df), Some(lit(123456789L)))
    assert(out.columns.toSeq === Seq(
      "event_id", "user_id", "event_type", "value", "k", "_raw_data", "received_at"))
    val r = out.collect().head
    assert(r.getAs[Int]("k") === 3)
    assert(r.getAs[String]("_raw_data") === """{"k": 3}""")
    assert(r.getAs[Long]("received_at") === 123456789L)
  }

  test("full accepted DAG on driver testdata splits 202/401 exactly") {
    graft.GraftSession.tune(spark)
    val ev = graft.tables.Tables.eventsNorm(spark, sfSmoke)
    val keys = graft.tables.Tables.activeKeys(spark, sfSmoke)
    val acc = IngestPipeline.accepted(ev, keys, Some(lit(0L))).count()
    val rej = IngestPipeline.rejectedAuth(ev, keys).count()
    assert(acc + rej === ev.count())
    assert(acc > 0 && rej > 0)
  }

  test("parse keeps the raw payload for corrupt rows (DLQ retention)") {
    val parsed = parse(malformedPayloads.filter(_.nonEmpty))
    val kept = IngestPipeline.rejectedMalformed(parsed)
      .select(col(IngestPipeline.corruptCol))
      .as[String].collect().toSet
    assert(kept === malformedPayloads.filter(_.nonEmpty).toSet)
  }
}
