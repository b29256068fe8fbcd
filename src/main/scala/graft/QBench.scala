package graft

/** Dev-only single-query timer: `runMain graft.QBench <name> [sfDir]
  * [runs]` — the per-query iteration loop Bench is too coarse for
  * (one warmup + N timed noop-write runs inside one JVM, medians and
  * mins like Bench, same cache hygiene).
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: graft.QBench <query> [sfDir] [runs]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      s
    }
    once() // warmup
    val times = (1 to runs).map(_ => once()).sorted
    println(f"[qbench] $name median=${times(runs / 2)}%.3f min=${times.head}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
