package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** S1 end-to-end: the HTTP ingest endpoint as a DSv2 micro-batch
  * source. The request matrix mirrors the reference's handler table
  * test (`publisher/internal/api/handler_test.go:45-182`: 202 / 401
  * missing / 401 invalid / 400 empty / 400 bad JSON / 405 method),
  * then the buffered payloads are consumed as a checkpointed stream.
  */
class HttpIngestSourceSpec extends SparkSpec with BeforeAndAfterAll {

  private val client = HttpClient.newHttpClient()
  private var state: HttpIngest.State = _
  private def port: Int = state.port

  override def beforeAll(): Unit = {
    state = HttpIngest.getOrStart(0, Set("key-1", "key-2"))
    super.beforeAll()
  }
  override def afterAll(): Unit = {
    HttpIngest.stop(port)
    super.afterAll()
  }

  private def post(body: String, key: Option[String]): Int = {
    val b = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/ingest"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    key.foreach(b.header("X-API-Key", _))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
  }

  test("handler matrix: 202 queued / 401 missing / 401 invalid / 400 empty / 400 bad JSON / 405 method") {
    assert(post("""{"sensor_id": "s1", "temperature": 21.5}""", Some("key-1")) === 202)
    assert(post("""{"k": 1}""", None) === 401)
    assert(post("""{"k": 1}""", Some("wrong-key")) === 401)
    assert(post("", Some("key-1")) === 400)
    assert(post("""{"k": }""", Some("key-1")) === 400)
    // strict whole-string validity, like Go json.Valid (Jackson would accept this)
    assert(post("""{"k": 1}trailing""", Some("key-2")) === 400)
    val get = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port/ingest")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(get.statusCode() === 405)
  }

  test("accepted payloads flow through a checkpointed micro-batch stream; rejects never enter") {
    import spark.implicits._
    // the matrix test already queued exactly one valid payload; add two more
    assert(post("""{"sensor_id": "s2", "temperature": 22.0}""", Some("key-2")) === 202)
    assert(post("""{"sensor_id": "s3"}""", Some("key-1")) === 202)
    assert(post("""not json""", Some("key-1")) === 400) // must NOT appear downstream

    val ckpt = Files.createTempDirectory("graft-http-src").toString
    val q = spark.readStream.format("http-ingest")
      .option("port", port.toString)
      .load()
      .writeStream.format("memory").queryName("http_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val rows = spark.table("http_out").as[(String, String)].collect().sortBy(_._1)
    assert(rows.length === 3)
    assert(rows.map(_._2).toSet === Set("key-1", "key-2"))
    assert(rows.exists(r => r._1.contains("s2") && r._2 == "key-2"))

    // restart from the SAME checkpoint: the WAL has batch 0's end
    // offset, so the resumed query reads only what arrived after it
    // (at-least-once from the first commit on, D1/D2 over HTTP)
    assert(post("""{"sensor_id": "s4"}""", Some("key-2")) === 202)
    // (foreachBatch: the memory sink refuses checkpoint recovery)
    val resumed = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q2 = spark.readStream.format("http-ingest")
      .option("port", port.toString)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.as[(String, String)].collect().foreach(resumed.add)
      }
      .start()
    q2.awaitTermination(60000)
    assert(resumed.toArray.toSeq === Seq(("""{"sensor_id": "s4"}""", "key-2")))
  }

  test("curl-to-parquet: HTTP POSTs flow through the full ingest DAG (auth semi-join, DLQ) and answer the reference queries") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import spark.implicits._
    // fresh endpoint so the other tests' payloads don't interleave
    val st = HttpIngest.getOrStart(0, Set("key-1"))
    try {
      def postTo(body: String): Int = {
        val b = HttpRequest.newBuilder(URI.create(s"http://localhost:${st.port}/ingest"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .header("X-API-Key", "key-1")
        client.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
      }
      // full event envelopes, inner props as an escaped JSON string —
      // the publisher README's curl walkthrough (publisher/README.md:106-155)
      assert(postTo("""{"event_id":1,"user_id":1,"event_type":"click","value":1.5,"props":"{\"k\":1}"}""") === 202)
      assert(postTo("""{"event_id":2,"user_id":2,"event_type":"view","value":2.0,"props":"{\"k\": }"}""") === 202) // inner props malformed → DLQ
      assert(postTo("""{"event_id":3,"user_id":99,"event_type":"click","value":3.0,"props":"{\"k\":3}"}""") === 202) // unknown user → auth reject

      val (out, dlq, ckpt) = (
        Files.createTempDirectory("http-e2e-out").toString,
        Files.createTempDirectory("http-e2e-dlq").toString,
        Files.createTempDirectory("http-e2e-ckpt").toString)
      // the shared envelope decode — the same path fromKafka uses
      val events = graft.streaming.IngestStream.fromEnvelope(
        spark.readStream.format("http-ingest")
          .option("port", st.port.toString).load())
      val q = graft.streaming.IngestStream.start(
        events, Seq(1L, 2L).toDF("api_key"), out, dlq, ckpt,
        Trigger.AvailableNow(), Some(lit(777L)))
      q.awaitTermination(60000)

      val t = spark.read.parquet(out)
      // Q1/Q2-style read-back: only event 1 survives parse+auth
      assert(t.count() === 1)
      val r = t.collect().head
      assert(r.getAs[Long]("event_id") === 1L)
      assert(r.getAs[Int]("k") === 1)
      assert(r.getAs[String]("_raw_data") === """{"k":1}""")
      // the malformed-inner-props event landed in the DLQ with its raw payload
      assert(spark.read.parquet(dlq).count() === 1)
    } finally HttpIngest.stop(st.port)
  }

  test("full buffer sheds load with 503 instead of growing without bound") {
    val s = HttpIngest.getOrStart(0, Set.empty, maxBuffered = 2)
    try {
      def postTo(body: String): Int = {
        val b = HttpRequest.newBuilder(URI.create(s"http://localhost:${s.port}/ingest"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .header("X-API-Key", "any")
        client.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
      }
      assert(postTo("""{"a":1}""") === 202)
      assert(postTo("""{"a":2}""") === 202)
      assert(postTo("""{"a":3}""") === 503)
      // commit drains the buffer → capacity frees up
      s.truncate(2)
      assert(postTo("""{"a":4}""") === 202)
    } finally HttpIngest.stop(s.port)
  }

  test("recovered checkpoint offsets ahead of a fresh buffer rebase it (driver-restart safety)") {
    val s = HttpIngest.getOrStart(0, Set.empty)
    try {
      // arrivals between server start and query resume
      s.append(HttpIngest.Received("""{"pre":1}""", "k"))
      // resumed query hands the stream its checkpointed offset (5)
      // from before the restart — the fresh buffer must renumber
      // AFTER it, not alias into the already-committed range
      new HttpIngestMicroBatchStream(s.port, Set.empty).deserializeOffset("5")
      s.append(HttpIngest.Received("""{"post":2}""", "k"))
      assert(s.count === 7)
      assert(s.slice(5, 7).map(_.value).toSeq ===
        Seq("""{"pre":1}""", """{"post":2}"""),
        "pre-resume arrivals renumber after the recovered offset and stay deliverable")
      // committing the recovered range must not destroy them
      s.truncate(5)
      assert(s.slice(5, 7).length === 2)
    } finally HttpIngest.stop(s.port)
  }

  test("rebase survives post-restart arrivals OUTNUMBERING the recovered offset") {
    // review-caught data loss: with 6 fresh arrivals and checkpoint
    // offset 5, the old `offset > buffered` guard skipped the rebase
    // and the resumed committed range [0,5) swallowed the first five
    // NEW payloads
    val s = HttpIngest.getOrStart(0, Set.empty)
    try {
      (1 to 6).foreach(i => s.append(HttpIngest.Received(s"""{"n":$i}""", "k")))
      new HttpIngestMicroBatchStream(s.port, Set.empty).deserializeOffset("5")
      assert(s.count === 11, "6 fresh arrivals renumber after offset 5")
      assert(s.slice(5, 11).map(_.value).toSeq ===
        (1 to 6).map(i => s"""{"n":$i}"""),
        "every post-restart payload stays deliverable")
    } finally HttpIngest.stop(s.port)
  }

  test("a second concurrent stream on one endpoint is rejected (commit truncates shared state)") {
    val s = HttpIngest.getOrStart(0, Set.empty)
    try {
      val first = new HttpIngestMicroBatchStream(s.port, Set.empty)
      val ex = intercept[IllegalArgumentException] {
        new HttpIngestMicroBatchStream(s.port, Set.empty)
      }
      assert(ex.getMessage.contains("one stream per"))
      first.stop() // detach → a successor may attach (restart path)
      new HttpIngestMicroBatchStream(s.port, Set.empty).stop()
    } finally HttpIngest.stop(s.port)
  }

  test("commit truncates the driver buffer but offsets stay global (memory bound)") {
    val s = HttpIngest.getOrStart(0, Set.empty)
    try {
      s.append(HttpIngest.Received("""{"a":1}""", "k"))
      s.append(HttpIngest.Received("""{"b":2}""", "k"))
      s.append(HttpIngest.Received("""{"c":3}""", "k"))
      assert(s.count === 3)
      // what the stream's commit(end=2) does after a checkpointed batch
      new HttpIngestMicroBatchStream(s.port, Set.empty).commit(HttpIngestOffset(2))
      assert(s.count === 3, "count is a global offset, not a buffer size")
      assert(s.slice(0, 3).map(_.value).toSeq === Seq("""{"c":3}"""),
        "committed prefix is gone; requests below base clamp to what remains")
      assert(s.slice(2, 3).map(_.value).toSeq === Seq("""{"c":3}"""))
    } finally HttpIngest.stop(s.port)
  }
}
