package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main for the r8 q16_exists bench anomaly (r8 harness
  * median 3.611 s vs isolated ~0.75 s). Reproduces the harness
  * context (runs all other queries with the same inter-run cache
  * clearing Bench does), then times q16 with its cost split into
  * view-registration / sql() analysis / execution, plus a
  * DataFrame-API twin of the same EXISTS to isolate the `spark.sql`
  * path.
  *
  * r9 finding: the anomaly does NOT reproduce — isolated 0.51 s,
  * polluted 0.35-0.48 s, real Bench harness 0.332 s median (see
  * [[graft.queries.Queries.q16Exists]] Scaladoc for the full
  * numbers). Kept because the number came from the DRIVER's and
  * judge's environment: if BENCH_r09 regresses again, run
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Q16Probe"` there — the
  * phase that inflates (views / sql / exec, isolated vs polluted)
  * localizes the cause in one run.
  */
object Q16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    spark.range(1000000L).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def clearLikeBench(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    def dfTwin(): DataFrame = {
      import graft.tables.Tables
      GraftSession.tune(spark)
      val heavy = Tables.lineitem(spark, sfDir)
        .filter(col("l_quantity") >= 45).select(col("l_orderkey"))
      Tables.orders(spark, sfDir)
        .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }

    def probeQ16(tag: String): Unit = {
      (1 to 5).foreach { i =>
        val (tViews, _) = t {
          GraftSession.tune(spark)
          graft.tables.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
          graft.tables.Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_v")
        }
        val (tSql, df) = t {
          spark.sql("""
            SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM orders_v
            WHERE EXISTS (SELECT 1 FROM lineitem_v
                          WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
            ORDER BY o_orderkey""")
        }
        val (tExec, _) = t { df.write.format("noop").mode("overwrite").save() }
        println(f"[$tag run $i] views=$tViews%.3f sql=$tSql%.3f exec=$tExec%.3f total=${tViews + tSql + tExec}%.3f")
        clearLikeBench()
        val (tTwin, _) = t { dfTwin().write.format("noop").mode("overwrite").save() }
        println(f"[$tag run $i] df_twin=$tTwin%.3f")
        clearLikeBench()
      }
    }

    println("=== PHASE A: isolated ===")
    probeQ16("isolated")

    println("=== PHASE B: polluting with all other queries (1 run each) ===")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (name != "q16_exists") {
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"[pollute] $name failed: ${e.getMessage}") }
        clearLikeBench()
      }
    }
    println("=== PHASE C: q16 in polluted context ===")
    probeQ16("polluted")
    spark.stop()
  }
}
