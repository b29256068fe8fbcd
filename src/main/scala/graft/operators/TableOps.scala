package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog/DDL surface (SURVEY §2.6 Q5-Q7): the operations the
  * reference performs against ClickHouse DDL
  * (`consumer/clickhouse/init-db.sh:20-36`,
  * `ClickHouseRepositoryIntegrationTest.kt:124` TRUNCATE,
  * `ClickHouseWriterService.kt:140` batched INSERT), expressed
  * through the Spark catalog + DataFrameWriter.
  */
object TableOps {

  /** Q6: CREATE DATABASE/TABLE IF NOT EXISTS — a managed parquet
    * table in the session catalog (the `MergeTree` DDL analog; the
    * sort/partition layout lives in [[EventsSink]]).
    */
  def createTable(spark: SparkSession, db: String, table: String,
                  schemaDdl: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $db.$table ($schemaDdl) USING parquet")
  }

  /** Q7: batched INSERT append — `DataFrameWriter.mode(Append)`
    * replaces the reference's hand-built prepared-statement batches
    * (`ClickHouseRepository.kt:60-97`); batching/parallelism are the
    * writer's partitions.
    */
  def insertAppend(df: DataFrame, db: String, table: String): Unit =
    df.write.mode(SaveMode.Append).saveAsTable(s"$db.$table")

  /** Q5: TRUNCATE TABLE (the integration tests' per-test reset). */
  def truncate(spark: SparkSession, db: String, table: String): Unit =
    spark.sql(s"TRUNCATE TABLE $db.$table")

  /** Overwrite-load: the atomic swap variant of truncate+insert. */
  def overwrite(df: DataFrame, db: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(s"$db.$table")

  def dropTable(spark: SparkSession, db: String, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
}
