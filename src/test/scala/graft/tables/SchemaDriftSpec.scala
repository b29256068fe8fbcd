package graft.tables

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Sentinel against driver-side testdata regeneration. Round 7
  * regenerated `events.parquet` with a different `ts` encoding
  * between the round's last commit and its verify run, and the first
  * symptom was 26 queries crashing at plan time. This suite makes the
  * NEXT drift fail as one line naming the table, column, and type
  * that moved.
  *
  * Column NAMES are pinned exactly (a rename breaks every query
  * referencing it). Types are pinned loosely — the classes of drift
  * the queries actually tolerate are enumerated per column, so a
  * tolerated regeneration (int32→int64 widening, either events
  * timestamp generation) stays green while anything novel goes red.
  */
class SchemaDriftSpec extends SparkSpec {

  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private val fractional: Set[DataType] = Set(FloatType, DoubleType)
  private val stringy: Set[DataType] = Set(StringType)
  private val date: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)
  // the two observed events-ts generations (nanos-as-long, micros)
  private val eventTs: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)
  private val floatVec: Set[DataType] =
    Set(ArrayType(FloatType, true), ArrayType(FloatType, false),
      ArrayType(DoubleType, true), ArrayType(DoubleType, false))

  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> integral, "r_name" -> stringy),
    "nation" -> Seq("n_nationkey" -> integral, "n_name" -> stringy,
      "n_regionkey" -> integral),
    "customer" -> Seq("c_custkey" -> integral, "c_name" -> stringy,
      "c_nationkey" -> integral, "c_acctbal" -> fractional,
      "c_mktsegment" -> stringy),
    "supplier" -> Seq("s_suppkey" -> integral, "s_name" -> stringy,
      "s_nationkey" -> integral, "s_acctbal" -> fractional),
    "part" -> Seq("p_partkey" -> integral, "p_name" -> stringy,
      "p_brand" -> stringy, "p_type" -> stringy, "p_size" -> integral,
      "p_retailprice" -> fractional),
    "orders" -> Seq("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> stringy, "o_totalprice" -> fractional,
      "o_orderdate" -> date, "o_orderpriority" -> stringy),
    "lineitem" -> Seq("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> fractional, "l_extendedprice" -> fractional,
      "l_discount" -> fractional, "l_tax" -> fractional,
      "l_returnflag" -> stringy, "l_linestatus" -> stringy,
      "l_shipdate" -> date),
    "events" -> Seq("event_id" -> integral, "ts" -> eventTs,
      "user_id" -> integral, "event_type" -> stringy,
      "value" -> fractional, "props" -> stringy),
    "documents" -> Seq("doc_id" -> integral, "text" -> stringy,
      "lang" -> stringy, "source" -> stringy, "n_chars" -> integral),
    "embeddings" -> Seq("vec_id" -> integral, "embedding" -> floatVec,
      "label" -> integral))

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"driver testdata at $sf matches the pinned schema envelope") {
      val drift = Tables.names.flatMap { t =>
        val actual = Tables.load(spark, sf, t).schema
        val exp = expected(t)
        val missing = exp.map(_._1).filterNot(actual.fieldNames.contains)
          .map(c => s"$t.$c MISSING")
        val extra = actual.fieldNames.filterNot(exp.map(_._1).contains)
          .map(c => s"$t.$c UNEXPECTED (new column — queries ignore it, " +
            "but pin it here once depended on)")
        val retyped = exp.flatMap { case (c, ok) =>
          actual.fields.find(_.name == c)
            .filterNot(f => ok.contains(f.dataType))
            .map(f => s"$t.$c DRIFTED to ${f.dataType} (tolerated: ${ok.mkString(", ")})")
        }
        missing ++ retyped ++ extra
      }
      assert(drift.isEmpty, "testdata schema drift:\n  " + drift.mkString("\n  "))
    }
  }
}
