package graft.streaming

import java.sql.SQLException

import org.apache.spark.sql.jdbc.JdbcDialect

/** Spark JDBC dialect for DuckDB — the piece a deployment ships when
  * the [[Sinks]] target is a DuckDB warehouse file (the second
  * runtime-verified engine of the exactly-once sink matrix; Derby is
  * the first). Spark has no built-in DuckDB dialect, and the default
  * dialect breaks on the very first write: Spark 4's
  * `JdbcUtils.tableExists` probe treats an exception as "table
  * missing" ONLY if the dialect classifies it via
  * `isObjectNotFoundException`; DuckDB raises `Catalog Error: Table
  * with name .. does not exist!` with no SQLState, which the default
  * classifier does not recognize, so the probe's expected failure
  * propagates instead of answering `false`.
  *
  * Registration is explicit
  * (`JdbcDialects.registerDialect(DuckDbDialect)`) — same pattern as
  * the per-warehouse Derby dialect the specs register.
  */
object DuckDbDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb")

  /** DuckDB reports catalog misses as a plain SQLException whose
    * message starts `Catalog Error:` and says `does not exist` —
    * no SQLState, no vendor code (verified against
    * org.duckdb:duckdb_jdbc:1.0.0). */
  override def isObjectNotFoundException(e: SQLException): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("Catalog Error") && m.contains("does not exist")
  }

  /** DuckDB's JDBC ResultSetMetaData does not report BIGINT as
    * signed, so Spark's default mapping widens it to DECIMAL(20,0)
    * (its unsigned-BIGINT treatment) and a typed `as[Long]` read then
    * fails with CANNOT_UP_CAST (observed). DuckDB's BIGINT is the
    * signed 64-bit type — map it back; the unsigned types have their
    * own names (UBIGINT/HUGEINT) and keep the default widening. */
  override def getCatalystType(
      sqlType: Int, typeName: String, size: Int,
      md: org.apache.spark.sql.types.MetadataBuilder)
      : Option[org.apache.spark.sql.types.DataType] =
    (sqlType, typeName.toUpperCase(java.util.Locale.ROOT)) match {
      case (java.sql.Types.BIGINT, "BIGINT") =>
        Some(org.apache.spark.sql.types.LongType)
      case _ => None
    }
}
