package graft.operators

import graft.SparkSpec

/** Q5/Q6/Q7: catalog DDL + append/truncate/overwrite semantics,
  * mirroring `ClickHouseRepositoryIntegrationTest.kt` (create →
  * insert → count → truncate → empty).
  */
class TableOpsSpec extends SparkSpec {
  import spark.implicits._

  private val db = "graft_test"
  private val table = "ingest_data"

  test("parquet schema evolution: mergeSchema unions batch schemas, absent columns read as NULL") {
    // the lenient-ingest story at the storage layer: later batches may
    // carry new payload fields (SURVEY §1.3); existing files stay
    // valid and the union schema reads them with NULLs
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "c_old").write.mode("append").parquet(dir)
    Seq((2L, 5.5)).toDF("id", "c_new").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("c_new", "c_old", "id"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[String]("c_old") === "a")
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("c_new")))
    assert(byId(2L).getAs[Double]("c_new") === 5.5)
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("c_old")))
    // and column pruning still reaches the scan on the merged schema
    val p = merged.select(col("id")).queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema") && !p.contains("c_old"), p.take(600))
  }

  test("create/insert/truncate/overwrite round-trip through the catalog") {
    TableOps.dropTable(spark, db, table)
    TableOps.createTable(spark, db, table,
      "sensor_id STRING, temperature DOUBLE, value INT")
    assert(spark.catalog.tableExists(s"$db.$table"))
    assert(spark.table(s"$db.$table").count() === 0)

    val batch1 = Seq(("s1", 20.5, 1), ("s2", 21.0, 2))
      .toDF("sensor_id", "temperature", "value")
    TableOps.insertAppend(batch1, db, table)
    assert(spark.table(s"$db.$table").count() === 2)

    // Q7: append accumulates (batched INSERT semantics)
    TableOps.insertAppend(batch1, db, table)
    assert(spark.table(s"$db.$table").count() === 4)

    // Q5: TRUNCATE empties but keeps the table
    TableOps.truncate(spark, db, table)
    assert(spark.catalog.tableExists(s"$db.$table"))
    assert(spark.table(s"$db.$table").count() === 0)

    // overwrite variant
    TableOps.overwrite(batch1, db, table)
    assert(spark.table(s"$db.$table").count() === 2)

    TableOps.dropTable(spark, db, table)
    assert(!spark.catalog.tableExists(s"$db.$table"))
  }

  test("null fields survive the insert round-trip (P5 null binding)") {
    TableOps.dropTable(spark, db, "nulls_t")
    TableOps.createTable(spark, db, "nulls_t",
      "sensor_id STRING, temperature DOUBLE")
    TableOps.insertAppend(
      Seq(("s1", Option.empty[Double]), (null: String, Some(1.5)))
        .toDF("sensor_id", "temperature"),
      db, "nulls_t")
    val rows = spark.table(s"$db.nulls_t")
      .collect().map(r => (r.getAs[String](0), Option(r.get(1)))).toSet
    assert(rows === Set(("s1", None), (null, Some(1.5))))
    TableOps.dropTable(spark, db, "nulls_t")
  }
}
