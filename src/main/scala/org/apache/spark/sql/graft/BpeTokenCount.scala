/* Hosted under org.apache.spark.sql for private[sql] access
 * (ImplicitCastInputTypes, ExpressionUtils) — the standard packaging
 * for third-party native Catalyst expressions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The APPLY side of BPE ([[graft.operators.Bpe]] is the trainer):
  * tokenize the text (`[A-Za-z0-9]+` runs, ASCII-lowercased), apply
  * the learned merge table to each word in rank order, and return
  * the total subword-token count.
  *
  * Symbols are compared BY ID (2-hex-char base ids, "mNN" merge
  * ids), the same algebra the trainer and the DuckDB oracle use —
  * see [[graft.operators.Bpe]] for why content comparison would be
  * wrong. One left-to-right pass per merge is the complete
  * application of that merge (a replacement introduces only the
  * fresh id, never a new occurrence of the pair it replaced), so
  * rank-order passes reproduce the classic lowest-rank-first greedy
  * loop exactly for any trainer-produced table.
  *
  * Native `UnaryExpression` with `doGenCode` — one static call per
  * row inside whole-stage codegen; the merge table rides along as a
  * codegen reference object, the Catalyst analog of a broadcast
  * (per-plan, not per-row).
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  @transient private lazy val table: BpeMergeTable =
    new BpeMergeTable(merges.map(m => Array(m._1, m._2, m._3)).toArray)

  override protected def nullSafeEval(input: Any): Any =
    table.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)

  override def prettyName: String = "bpe_token_count"
}

object BpeTokenCount {
  /** Column wrapper over trainer output. */
  def apply(text: Column, merges: Seq[graft.operators.Bpe.Merge]): Column =
    ExpressionUtils.column(BpeTokenCount(
      ExpressionUtils.expression(text),
      merges.map(m => (m.leftId, m.rightId, m.mergedId))))
}

/** Merge table in id space: `pairs(r) = [leftId, rightId, mergedId]`
  * in rank order. Sentinel ranks ("zz" ids) can never match a hex or
  * mNN id and are skipped structurally. */
final class BpeMergeTable(val pairs: Array[Array[String]]) extends Serializable {

  /** Tokenize + apply + count, one fused pass per row. Called from
    * generated code. */
  def countTokens(text: UTF8String): Long = {
    val s = text.toString
    var total = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      if (isAlnum(s.charAt(i))) {
        var j = i + 1
        while (j < n && isAlnum(s.charAt(j))) j += 1
        total += tokenizeWord(s, i, j)
        i = j
      } else i += 1
    }
    total
  }

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  @inline private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Subword count of one word after all merges. */
  private def tokenizeWord(s: String, from: Int, until: Int): Int = {
    var syms = new Array[String](until - from)
    var i = from
    while (i < until) {
      val c = lower(s.charAt(i))
      syms(i - from) = BpeMergeTable.hexId(c)
      i += 1
    }
    var r = 0
    while (r < pairs.length) {
      val p = pairs(r)
      syms = graft.operators.Bpe.applyMerge(syms, p(0), p(1), p(2))
      r += 1
    }
    syms.length
  }
}

object BpeMergeTable {
  private val hexIds: Array[String] =
    Array.tabulate(128)(i => f"$i%02x")

  /** 2-hex id of an ASCII char (callers guarantee `c < 128` — the
    * token grammar admits only `[a-z0-9]` after folding). */
  def hexId(c: Char): String = hexIds(c)
}
