package graft.functions

import org.apache.spark.sql.Column

/** Column wrappers for graft's native Catalyst expressions (hosted
  * under org.apache.spark.sql.graft for private[sql] access).
  */
object GraftFunctions {

  /** Strict JSON validity (Go `json.Valid` semantics) — see
    * [[org.apache.spark.sql.graft.JsonIsValid]].
    */
  def jsonIsValid(c: Column): Column =
    org.apache.spark.sql.graft.JsonIsValid(c)

  /** Strict validity AND top-level object, in one byte-level pass —
    * see [[org.apache.spark.sql.graft.JsonIsValidObject]].
    */
  def jsonIsValidObject(c: Column): Column =
    org.apache.spark.sql.graft.JsonIsValidObject(c)
}
