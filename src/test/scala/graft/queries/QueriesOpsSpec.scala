package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics checks for the round-9 query additions that the DuckDB
  * oracle alone can't pin: the ClickHouse-greedy sequenceCount rule
  * and the corpus-driven line-dedup rule.
  */
class QueriesOpsSpec extends SparkSpec {
  import spark.implicits._

  /** The ClickHouse sequenceCount('(?1)(?2)') greedy scan, written
    * out imperatively as the independent truth.
    */
  private def greedySpCount(seq: String): Long = {
    var open = false
    var n = 0L
    seq.foreach {
      case 's' if !open => open = true
      case 'p' if open => n += 1; open = false
      case _ => ()
    }
    n
  }

  private def spe(seq: String): Long = {
    // subsequence s..p..e
    val i = seq.indexOf('s')
    val j = if (i < 0) -1 else seq.indexOf('p', i + 1)
    val k = if (j < 0) -1 else seq.indexOf('e', j + 1)
    if (k >= 0) 1L else 0L
  }

  test("q51 matches an imperative greedy re-computation for every user") {
    val rows = QueriesOps.q51SequenceMatch(spark, sfSmoke)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // independent truth: rebuild each user's ordered char sequence
    val seqs = graft.tables.Tables.eventsNorm(spark, sfSmoke)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        expr("""CASE event_type WHEN 'signup' THEN 's' WHEN 'purchase' THEN 'p'
                WHEN 'error' THEN 'e' WHEN 'click' THEN 'c' ELSE 'v' END""").as("c"))
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
      .map { case (u, es) =>
        u -> es.sortBy(e => (e._2, e._3)).map(_._4).mkString
      }
    rows.foreach { case (u, matched, nSp) =>
      val seq = seqs(u)
      assert(matched === spe(seq), s"user $u matched_spe, seq=$seq")
      assert(nSp === greedySpCount(seq), s"user $u n_sp, seq=$seq")
    }
    // non-vacuous: both outcomes of the match flag occur
    assert(rows.exists(_._2 == 1L) || rows.forall(_._2 == 1L))
    assert(rows.exists(_._3 > 0L))
  }

  test("line dedup removes exactly the corpus-repeated lines, preserving order") {
    val got = QueriesOps.docLineDedup(spark, sfSmoke)
      .as[(Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (docId, nLines, nRemoved, clean) =>
      val lines = if (clean.isEmpty) Array.empty[String] else clean.split("\n")
      // boilerplate (>= 3 occurrences corpus-wide) never survives
      assert(!lines.contains("Subscribe to our newsletter"))
      assert(!lines.contains("Copyright 2024 Example Inc"))
      assert(!lines.exists(_.matches("share \\d+ widget")))
      // the two per-doc unique lines always survive, in order
      assert(lines.head.startsWith(s"doc $docId: "))
      assert(lines.last === s"tail content $docId")
      assert(nRemoved === nLines - lines.length)
    }
    // the planted boilerplate means every even doc lost its banner
    assert(got.filter(_._1 % 2 == 0).forall(_._3 >= 1))
  }

  test("session scratch never serves a dir built for a different signature") {
    // All signatures of a (tag, source) share ONE scratch dir, so the
    // cache must evict the old signature's entry on rebuild —
    // otherwise mutate -> rebuild -> restore (sig A -> B -> A, mtimes
    // preserved) leaves a stale A-keyed entry serving B-built scratch
    // (advisor r11 / review r12). nanoTime key: container pids recycle.
    val tag = s"scratch-evict-${System.nanoTime()}"
    val d = java.nio.file.Files
      .createTempDirectory(s"scratchspec-${System.nanoTime()}").toString
    val src = java.nio.file.Paths.get(d, "t.parquet")
    java.nio.file.Files.write(src, "AAAA".getBytes("UTF-8"))
    val mt = java.nio.file.Files.getLastModifiedTime(src)
    var builds = 0
    def call(): String = QueriesOps.sessionScratch(tag, d, "t") { dir =>
      builds += 1
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "marker"), builds.toString.getBytes)
    }
    val dir1 = call()
    assert(builds === 1)
    assert(call() === dir1 && builds === 1) // unchanged source: cache hit
    // in-place mutation hiding from count/size/mtime — only the
    // content sample in the signature can see it
    java.nio.file.Files.write(src, "BBBB".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(src, mt)
    call()
    assert(builds === 2)
    // restore the original bytes and mtime: signature returns to A,
    // but the shared dir now holds B-built scratch — must rebuild
    java.nio.file.Files.write(src, "AAAA".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(src, mt)
    call()
    assert(builds === 3)
    val marker = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir1, "marker")), "UTF-8")
    assert(marker === "3")
  }
}
