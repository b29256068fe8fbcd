package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o) => (s, o, None)
      // optional third arg: comma-separated query names, for quick
      // single-query re-verification while iterating
      case Array(s, o, names) => (s, o, Some(names.split(',').toSet))
      case _ =>
        System.err.println("usage: graft.Verify <sfDir> <outDir> [name1,name2,...]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s): ${unknown.mkString(", ")} — a typo here would " +
          "otherwise verify nothing and exit green")
    }
    var nFailed = 0
    selected.foreach { case (name, fn) =>
      // delete any PREVIOUS run's output first: a query that throws at
      // plan time (before the overwrite write starts) would otherwise
      // leave stale parquet behind, and a reused outDir would compare
      // the old results green (review-caught). With the pre-delete, a
      // failure yields a MISSING directory, which the driver records
      // as a red row.
      // The pre-delete sits INSIDE the per-query try: an undeletable or
      // racing directory must cost one red row, not abort the whole
      // batch. listFiles returns null (not empty) on I/O error — guard.
      val target = new java.io.File(s"$outDir/$name")
      try {
        if (target.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory)
              Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
            f.delete(); ()
          }
          rm(target)
        }
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        nFailed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A missing output directory is silently OMITTED from the
        // driver's correctness report (observed in round 7: 26 crashed
        // queries shrank the report from 85 to 63 all-green rows and
        // masked a systematic regression). Write an unmistakable
        // one-row error marker instead — its schema matches no oracle,
        // so the driver records an explicit red row.
        try {
          import spark.implicits._
          Seq(s"QUERY FAILED: ${e.toString.take(500)}").toDF("graft_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case m: Throwable =>
          System.err.println(s"[verify] $name: error marker also failed: ${m.getMessage}")
        }
      }
      // queries own their caches only for the duration of one run
      // (Dedup.minhashPairs etc.) — release between queries so the
      // batch neither re-caches identical plans nor pins memory
      spark.catalog.clearCache()
    }
    if (nFailed > 0)
      System.err.println(s"[verify] $nFailed of ${selected.size} queries FAILED " +
        "(their output directories hold a one-row graft_error marker instead of results)")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
