package graft.model

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.IngestPipeline

/** Property tests (SURVEY §5): parse∘serialize identity on the event
  * schema, and invariants of the text-analysis functions. ScalaCheck
  * generators with fixed seeds (the scalatest-scalacheck bridge
  * artifact isn't available offline, so sampling is explicit).
  */
class JsonRoundtripSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val genEvent: Gen[IngestedEvent] = for {
    sensorId <- Gen.option(Gen.alphaNumStr.map(_.take(12)))
    temperature <- Gen.option(Gen.chooseNum(-100.0, 200.0))
    ts <- Gen.option(Gen.chooseNum(0L, 2000000000L)
      .map(s => java.time.Instant.ofEpochSecond(s).toString))
    value <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    message <- Gen.option(Gen.asciiPrintableStr.map(_.take(40)))
  } yield IngestedEvent(sensorId, temperature, ts, value, message)

  test("to_json then parse recovers every IngestedEvent field (100 random events)") {
    (1L to 5L).foreach { seed =>
      val events = sample(Gen.listOfN(20, genEvent), seed)
      val df = events.toDF()
        .select(to_json(struct(col("*"))).as("props"))
      val parsed = IngestPipeline.parse(df, schema = IngestedEvent.schema)
      assert(IngestPipeline.rejectedMalformed(parsed).count() === 0)
      val back = IngestPipeline.admitted(parsed)
        .select(col("parsed.sensorId"), col("parsed.temperature"),
          col("parsed.timestamp"), col("parsed.value"), col("parsed.message"))
        .as[IngestedEvent].collect().toSeq
      assert(back.sortBy(_.toString) === events.sortBy(_.toString), s"seed $seed")
    }
  }

  test("qualityScore stays within [0,1] for arbitrary printable text") {
    val texts = sample(
      Gen.listOfN(200, Gen.asciiPrintableStr.map(_.take(200))), 7L)
    val scores = texts.toDF("t")
      .select(TextFunctions.qualityScore(col("t")).as("q"))
      .as[Double].collect()
    assert(scores.forall(q => q >= 0.0 && q <= 1.0), scores.mkString(","))
  }

  test("fingerprint is invariant under case and whitespace perturbation") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))
    (1L to 10L).foreach { seed =>
      val words = sample(Gen.nonEmptyListOf(word), seed)
      val original = words.mkString(" ")
      val shouted = words.map(_.toUpperCase).mkString("   ")
      val fps = Seq(original, shouted).toDF("t")
        .select(TextFunctions.fingerprintMd5(col("t")).as("f"))
        .as[String].collect()
      assert(fps(0) === fps(1), s"seed $seed: '$original'")
    }
  }
}
