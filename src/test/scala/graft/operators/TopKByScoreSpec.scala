package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TopKByScore, TopKState}

import graft.SparkSpec

/** The bounded-heap top-k aggregate, pinned against the obvious
  * sort-based specification at the state level (randomized, seeded)
  * and against a window-rank plan at the DataFrame level.
  */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  private def spec(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortWith { case ((sa, ia), (sb, ib)) => sa > sb || (sa == sb && ia < ib) }
      .take(k)

  test("heap state equals sort-based top-k on randomized inputs (incl. ties and duplicates)") {
    val rnd = new Random(42)
    for (trial <- 1 to 200) {
      val n = rnd.nextInt(60)
      val k = 1 + rnd.nextInt(12)
      // coarse scores force plenty of ties; ids may repeat too
      val xs = Seq.fill(n)((rnd.nextInt(8) / 4.0, rnd.nextInt(20).toLong))
      val st = new TopKState(k)
      xs.foreach { case (s, i) => st.insert(s, i) }
      assert(st.sortedPairs.toSeq === spec(xs, k), s"trial $trial: n=$n k=$k xs=$xs")
    }
  }

  test("merge of split states equals single-state insertion (partial-aggregation contract)") {
    val rnd = new Random(7)
    for (trial <- 1 to 100) {
      val xs = Seq.fill(rnd.nextInt(80))((rnd.nextDouble(), rnd.nextLong()))
      val k = 1 + rnd.nextInt(10)
      val (l, r) = xs.splitAt(rnd.nextInt(xs.length + 1))
      val one = new TopKState(k)
      xs.foreach { case (s, i) => one.insert(s, i) }
      val a = new TopKState(k); l.foreach { case (s, i) => a.insert(s, i) }
      val b = new TopKState(k); r.foreach { case (s, i) => b.insert(s, i) }
      var j = 0
      while (j < b.size) { a.insert(b.scores(j), b.ids(j)); j += 1 }
      assert(a.sortedPairs.toSeq === one.sortedPairs.toSeq, s"trial $trial")
    }
  }

  test("NaN scores rank first (Double.compare total order, matching ORDER BY DESC)") {
    val st = new TopKState(3)
    st.insert(0.5, 1L); st.insert(Double.NaN, 2L)
    st.insert(0.9, 3L); st.insert(0.1, 4L)
    assert(st.sortedPairs.toSeq.map(_._2) === Seq(2L, 3L, 1L))
  }

  test("aggregate equals the window-rank formulation on a DataFrame") {
    val rnd = new Random(3)
    // unique id per row: ties on score break by id on both paths
    val rows = Seq.tabulate(500)(i =>
      (s"g${i % 7}", rnd.nextInt(50) / 10.0, i.toLong))
    val df = rows.toDF("g", "score", "id")
    val viaAgg = df.groupBy(col("g"))
      .agg(TopKByScore(col("score"), col("id"), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "nb")))
      .select(col("g"), (col("pos") + 1).as("rnk"), col("nb.id"), col("nb.score"))
      .as[(String, Int, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("g"), col("rnk"), col("id"), col("score"))
      .as[(String, Int, Long, Double)].collect().toSet
    assert(viaAgg === viaWindow)
  }
}
