package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Snapshots]]: snapshot isolation (old versions byte-stable under
  * new commits), atomic manifest publication, optimistic-concurrency
  * refusal, time travel, and vacuum retention.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-snap").toString

  private def df(vals: Long*) = vals.toDF("id")
    .withColumn("payload", concat(lit("row-"), col("id")))

  test("commit/read round-trips and versions advance") {
    val dir = fresh()
    assert(Snapshots.currentVersion(dir) === -1L)
    assert(Snapshots.commit(df(1, 2, 3), dir) === 0L)
    assert(Snapshots.commit(df(10, 20), dir) === 1L)
    assert(Snapshots.currentVersion(dir) === 1L)
    assert(Snapshots.read(spark, dir).select("id").as[Long].collect().toSet
      === Set(10L, 20L))
  }

  test("time travel: every committed version stays readable as written") {
    val dir = fresh()
    Snapshots.commit(df(1, 2), dir)
    Snapshots.commit(df(3), dir)
    Snapshots.commit(df(4, 5, 6), dir)
    assert(Snapshots.read(spark, dir, 0).select("id").as[Long].collect().toSet === Set(1L, 2L))
    assert(Snapshots.read(spark, dir, 1).select("id").as[Long].collect().toSet === Set(3L))
    assert(Snapshots.read(spark, dir, 2).select("id").as[Long].collect().toSet === Set(4L, 5L, 6L))
  }

  test("a new commit never touches the files an old version references") {
    val dir = fresh()
    Snapshots.commit(df(1, 2), dir)
    def filesOf(v: Long): Map[String, Long] = {
      val m = java.nio.file.Paths.get(dir).resolve(f"_v$v%06d.manifest")
      new String(java.nio.file.Files.readAllBytes(m)).split("\n").filter(_.nonEmpty)
        .map { rel =>
          val p = java.nio.file.Paths.get(dir).resolve(rel)
          rel -> java.nio.file.Files.getLastModifiedTime(p).toMillis
        }.toMap
    }
    val before = filesOf(0L)
    Snapshots.commit(df(99), dir)
    assert(filesOf(0L) === before, "v0 files must be physically untouched")
  }

  test("optimistic concurrency: a stale expected version refuses to commit") {
    val dir = fresh()
    Snapshots.commit(df(1), dir) // v0
    Snapshots.commit(df(2), dir) // v1 — the "racer"
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(df(3), dir, expectedVersion = Some(0L))
    }
    assert(e.getMessage.contains("concurrent commit"))
    // the failed commit must not have advanced the table
    assert(Snapshots.currentVersion(dir) === 1L)
    assert(Snapshots.read(spark, dir).select("id").as[Long].collect().toSet === Set(2L))
  }

  test("vacuum drops old versions and their files, keeps the survivors") {
    val dir = fresh()
    Snapshots.commit(df(1), dir)
    Snapshots.commit(df(2), dir)
    Snapshots.commit(df(3), dir)
    Snapshots.vacuum(dir, keepFrom = 2L)
    intercept[IllegalArgumentException](Snapshots.read(spark, dir, 0))
    intercept[IllegalArgumentException](Snapshots.read(spark, dir, 1))
    assert(Snapshots.read(spark, dir, 2).select("id").as[Long].collect().toSet === Set(3L))
    // vacuumed data directories hold no parquet anymore
    val leftover = Files.walk(java.nio.file.Paths.get(dir, "data"))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val parquets = new scala.collection.mutable.ArrayBuffer[String]
    leftover.forEachRemaining(p => if (p.toString.endsWith(".parquet")) parquets += p.toString)
    assert(parquets.forall(_.contains("v000002")), parquets.mkString(","))
  }
}
