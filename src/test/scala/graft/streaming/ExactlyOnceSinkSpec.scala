package graft.streaming

import java.util.Properties

import graft.SparkSpec

/** [[Sinks.jdbcExactlyOnce]] against embedded Derby: replayed batches
  * must not duplicate (the contract [[Sinks.jdbcBatch]] cannot give),
  * across every crash window — before staging, after staging but
  * before the commit transaction, and after commit.
  */
class ExactlyOnceSinkSpec extends SparkSpec {
  import spark.implicits._

  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyVarcharDialect)

  private val url = "jdbc:derby:memory:graftxo;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }
  private var n = 0
  private def fresh(): (String, String) = {
    n += 1; (s"xo_target_$n", s"xo_ledger_$n")
  }

  private def rows(ids: Long*) = ids.toDF("id")
    .withColumn("payload", org.apache.spark.sql.functions.concat(
      org.apache.spark.sql.functions.lit("p"), org.apache.spark.sql.functions.col("id")))

  private def readIds(table: String): Seq[Long] =
    spark.read.jdbc(url, table, props).select("id").as[Long].collect().toSeq.sorted

  test("normal batches land once; a full replay of a committed batch is a no-op") {
    val (t, l) = fresh()
    val sink = Sinks.jdbcExactlyOnce(url, t, l, props,
      columnTypes = Some("payload VARCHAR(64)"))
    sink(rows(1, 2), 0L)
    sink(rows(3), 1L)
    assert(readIds(t) === Seq(1L, 2L, 3L))
    sink(rows(3), 1L) // foreachBatch replay after restart
    assert(readIds(t) === Seq(1L, 2L, 3L), "replay must not duplicate")
    // contrast: the at-least-once sink DOES duplicate the replay
    val alo = Sinks.jdbcBatch(url, s"${t}_alo", props,
      columnTypes = Some("payload VARCHAR(64)"))
    alo(rows(3), 1L); alo(rows(3), 1L)
    assert(readIds(s"${t}_alo") === Seq(3L, 3L))
  }

  test("crash AFTER staging but BEFORE the commit transaction: replay lands exactly once") {
    val (t, l) = fresh()
    val sink = Sinks.jdbcExactlyOnce(url, t, l, props,
      columnTypes = Some("payload VARCHAR(64)"))
    sink(rows(1), 0L)
    // simulate the crash window: the stage written, the tx never ran
    Sinks.stageBatch(rows(2, 3), url, t, 1L, props,
      columnTypes = Some("payload VARCHAR(64)"))
    // restart → foreachBatch replays batch 1 in full
    sink(rows(2, 3), 1L)
    assert(readIds(t) === Seq(1L, 2L, 3L))
  }

  test("a stale crash-leftover stage with DIFFERENT rows is replaced, not merged") {
    val (t, l) = fresh()
    val sink = Sinks.jdbcExactlyOnce(url, t, l, props,
      columnTypes = Some("payload VARCHAR(64)"))
    // first attempt staged a now-obsolete view of batch 0, then died
    Sinks.stageBatch(rows(7, 8, 9), url, t, 0L, props,
      columnTypes = Some("payload VARCHAR(64)"))
    // the replayed batch carries the authoritative rows
    sink(rows(7), 0L)
    assert(readIds(t) === Seq(7L))
  }

  test("double commit of the same staged batch is idempotent") {
    val (t, l) = fresh()
    Sinks.stageBatch(rows(5), url, t, 0L, props,
      columnTypes = Some("payload VARCHAR(64)"))
    Sinks.commitStaged(url, t, l, 0L, props)
    // second commit attempt: ledger says done, stage already dropped
    Sinks.commitStaged(url, t, l, 0L, props)
    assert(readIds(t) === Seq(5L))
  }

  test("target-creation DDL branches per JDBC dialect") {
    def sql(u: String) = Sinks.createTargetSql(u, "t", "t_stage_0")
    assert(sql("jdbc:derby:memory:x;create=true")
      === "CREATE TABLE t AS SELECT * FROM t_stage_0 WITH NO DATA")
    assert(sql("jdbc:postgresql://h:5432/db")
      === "CREATE TABLE t AS SELECT * FROM t_stage_0 WITH NO DATA")
    assert(sql("jdbc:mysql://h:3306/db") === "CREATE TABLE t LIKE t_stage_0")
    assert(sql("jdbc:mariadb://h/db") === "CREATE TABLE t LIKE t_stage_0")
    assert(sql("jdbc:sqlite:/tmp/x.db")
      === "CREATE TABLE t AS SELECT * FROM t_stage_0 WHERE 1=0")
    assert(sql("jdbc:sqlserver://h;databaseName=db")
      === "SELECT * INTO t FROM t_stage_0 WHERE 1=0")
    assert(sql("jdbc:clickhouse://h:8123/db") === "CREATE TABLE t AS t_stage_0")
    // duckdb parses WITH NO DATA but ignores it (copies the rows —
    // runtime-verified); it must get the empty-SELECT form
    assert(sql("jdbc:duckdb:/tmp/x.duckdb")
      === "CREATE TABLE t AS SELECT * FROM t_stage_0 WHERE 1=0")
    // unknown dialects get the standard's spelling
    assert(sql("jdbc:h2:mem:x")
      === "CREATE TABLE t AS SELECT * FROM t_stage_0 WITH NO DATA")
  }

  test("pre-created target with unquoted (case-folded) DDL: inserts resolve at batch 1") {
    // The documented MySQL/SQLite deployment path pre-creates the
    // target with ordinary unquoted DDL, which case-folds the stored
    // identifiers (Derby folds to UPPERCASE — the same class of
    // folding). The stage's identifiers are quoted-lowercase (Spark's
    // JDBC writer quotes at CREATE), so the insert's target-side
    // column list must come from the TARGET's own stored forms —
    // reusing the stage list quoted would reference "id" against a
    // stored ID and fail to resolve (advisor r10).
    val (t, l) = fresh()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // unquoted DDL → Derby stores ID / PAYLOAD
      try st.executeUpdate(s"CREATE TABLE $t (id BIGINT, payload VARCHAR(64))")
      finally st.close()
    } finally conn.close()
    val sink = Sinks.jdbcExactlyOnce(url, t, l, props,
      columnTypes = Some("payload VARCHAR(64)"))
    sink(rows(1, 2), 0L)
    sink(rows(1, 2), 0L) // replay still idempotent on the folded target
    assert(readIds(t) === Seq(1L, 2L))
  }
}
