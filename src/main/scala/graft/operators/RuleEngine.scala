package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Config-driven filter policies: compile a JSON rule document into a
  * Catalyst [[Column]] predicate.
  *
  * Why: curation policies (minimum length, language allowlists,
  * quality thresholds) change far more often than engine code. The
  * reference wires its filter policy into code/config
  * (application.yml-driven behavior); the analog here is a tiny rule
  * AST that ops can ship as data. Because compilation produces plain
  * `Column`s, the FULL optimizer applies — compiled rules push down
  * into parquet scans, fold constants, and stay inside whole-stage
  * codegen exactly like hand-written predicates (asserted in
  * RuleEngineSpec via the physical plan's PushedFilters).
  *
  * Grammar (one-key objects):
  * {{{
  *   {"eq"|"ne"|"lt"|"lte"|"gt"|"gte": [<field>, <literal>]}
  *   {"in":       [<field>, [<literal>, ...]]}
  *   {"contains": [<field>, <substring>]}   // strings
  *   {"matches":  [<field>, <regex>]}
  *   {"null": <field>}  |  {"notnull": <field>}
  *   {"and": [<rule>, ...]} | {"or": [<rule>, ...]} | {"not": <rule>}
  * }}}
  * Literals may be strings, numbers, or booleans. Comparisons follow
  * SQL three-valued logic (NULL field → NULL verdict → row filtered),
  * same as the hand-written predicate they replace.
  */
object RuleEngine {

  /** Compile a JSON rule string. Throws IllegalArgumentException on
    * malformed rules — a policy typo must fail loudly at submit time,
    * not silently keep everything.
    */
  def compile(json: String): Column =
    compileAst(JsonMethods.parse(json))

  private def lit0(v: JValue): Column = v match {
    case JString(s) => lit(s)
    case JInt(i) =>
      // .longValue on an out-of-Long-range BigInt silently truncates —
      // a policy typo must fail at submit time, not filter wrongly
      if (!i.isValidLong) fail(s"integer literal out of BIGINT range: $i")
      lit(i.longValue)
    case JLong(i) => lit(i)
    case JDouble(d) => lit(d)
    case JDecimal(d) =>
      // same loud-failure contract as the JInt guard: a decimal
      // literal that doesn't round-trip through double would compare
      // against a silently rounded value. Magnitude first: an
      // overflowing literal's doubleValue is Infinity, and
      // BigDecimal(Infinity) would throw a raw NumberFormatException
      // instead of the documented IllegalArgumentException
      // (review-caught, both halves)
      if (d.doubleValue.isInfinite || BigDecimal(d.doubleValue).compare(d) != 0)
        fail(s"decimal literal loses precision as double: $d")
      lit(d.doubleValue)
    case JBool(b) => lit(b)
    case other => fail(s"unsupported literal: $other")
  }

  private def fieldOf(v: JValue): Column = v match {
    case JString(name) => col(name)
    case other => fail(s"field must be a string, got: $other")
  }

  private def pair(args: JValue, op: String): (Column, Column) = args match {
    case JArray(List(f, v)) => (fieldOf(f), lit0(v))
    case other => fail(s"'$op' expects [field, literal], got: $other")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"bad rule: $msg")

  private def compileAst(v: JValue): Column = v match {
    case JObject(List(JField(op, args))) => op match {
      case "eq" => val (f, l) = pair(args, op); f === l
      case "ne" => val (f, l) = pair(args, op); f =!= l
      case "lt" => val (f, l) = pair(args, op); f < l
      case "lte" => val (f, l) = pair(args, op); f <= l
      case "gt" => val (f, l) = pair(args, op); f > l
      case "gte" => val (f, l) = pair(args, op); f >= l
      case "in" => args match {
        case JArray(List(f, JArray(vs))) => fieldOf(f).isin(vs.map(lit0): _*)
        case other => fail(s"'in' expects [field, [literals]], got: $other")
      }
      case "contains" => val (f, l) = pair(args, op); f.contains(l)
      case "matches" => val (f, l) = pair(args, op); f.rlike(
        args match { case JArray(List(_, JString(re))) => re; case _ => fail("'matches' needs a string regex") })
      case "null" => isnull(fieldOf(args))
      case "notnull" => fieldOf(args).isNotNull
      case "and" => args match {
        case JArray(rs) if rs.nonEmpty => rs.map(compileAst).reduce(_ && _)
        case other => fail(s"'and' expects a non-empty array, got: $other")
      }
      case "or" => args match {
        case JArray(rs) if rs.nonEmpty => rs.map(compileAst).reduce(_ || _)
        case other => fail(s"'or' expects a non-empty array, got: $other")
      }
      case "not" => !compileAst(args)
      case other => fail(s"unknown operator '$other'")
    }
    case other => fail(s"rule must be a single-key object, got: $other")
  }
}
