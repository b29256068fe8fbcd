package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter

/** Public door to the (private[sql]) Column → Catalyst Expression
  * conversion for code OUTSIDE the sql package — the snapshot stats
  * pruner walks a user predicate's expression tree to decide which
  * files may match before anything is scanned.
  *
  * Uses the eager [[ColumnNodeToExpressionConverter]] rather than
  * `ExpressionUtils.expression`: the latter hands back a lazy
  * `ColumnNodeExpression` wrapper whose tree is opaque until bound to
  * a plan, which a standalone walker can never pattern-match. Spark
  * 4's Column operators arrive as `UnresolvedFunction("=", ...)`-style
  * nodes — the pruner normalizes those by name. */
object ColumnBridge {
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
