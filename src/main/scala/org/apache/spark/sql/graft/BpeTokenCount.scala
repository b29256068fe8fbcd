/* Hosted under org.apache.spark.sql for private[sql] access
 * (ImplicitCastInputTypes, ExpressionUtils) — the standard packaging
 * for third-party native Catalyst expressions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}
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

/** The id-SEQUENCE sibling of [[BpeTokenCount]]: the per-document
  * `array<int>` of subword-token ids a training pipeline actually
  * feeds downstream (sequence packing, length bucketing, loss
  * masking) — counting alone cannot drive them. Same fused
  * tokenize+merge pass, same codegen'd single call per row; only the
  * reduction differs (emit ids instead of summing lengths).
  *
  * The vocabulary id space is fixed and deterministic: ids 0..25 are
  * `a..z`, 26..35 are `0..9`, and merge rank t takes id 35 + t —
  * so the same merge table always produces the same ids, and the
  * DuckDB oracle can reproduce the mapping closed-form.
  */
case class BpeTokenIds(child: Expression, merges: Seq[(String, String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val table: BpeMergeTable =
    new BpeMergeTable(merges.map(m => Array(m._1, m._2, m._3)).toArray)

  override protected def nullSafeEval(input: Any): Any =
    table.tokenIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokenIds($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenIds =
    copy(child = newChild)

  override def prettyName: String = "bpe_token_ids"
}

object BpeTokenIds {
  /** Column wrapper over trainer output. */
  def apply(text: Column, merges: Seq[graft.operators.Bpe.Merge]): Column =
    ExpressionUtils.column(BpeTokenIds(
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

  /** Tokenize + apply + emit token IDS, one fused pass per row —
    * [[BpeTokenIds]]' kernel. Id space: a..z -> 0..25, 0..9 ->
    * 26..35, merge rank t -> 35 + t. Called from generated code.
    */
  def tokenIds(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      if (isAlnum(s.charAt(i))) {
        var j = i + 1
        while (j < n && isAlnum(s.charAt(j))) j += 1
        val syms = tokenizeWordSyms(s, i, j)
        var k = 0
        while (k < syms.length) { out.add(syms(k)); k += 1 }
        i = j
      } else i += 1
    }
    val ids = new Array[Int](out.size)
    var k = 0
    while (k < ids.length) { ids(k) = tokOf.get(out.get(k)); k += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(ids)
  }

  /** Symbol id -> vocabulary token id (see [[tokenIds]] doc). */
  @transient private lazy val tokOf: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    var c = 'a'
    while (c <= 'z') { m.put(BpeMergeTable.hexId(c), c - 'a'); c = (c + 1).toChar }
    c = '0'
    while (c <= '9') { m.put(BpeMergeTable.hexId(c), 26 + (c - '0')); c = (c + 1).toChar }
    var r = 0
    while (r < pairs.length) { m.put(pairs(r)(2), 36 + r); r += 1 }
    m
  }

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  @inline private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Subword count of one word after all merges. */
  private def tokenizeWord(s: String, from: Int, until: Int): Int =
    tokenizeWordSyms(s, from, until).length

  /** One word's final symbol-id sequence after all merges. */
  private def tokenizeWordSyms(s: String, from: Int, until: Int): Array[String] = {
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
    syms
  }
}

object BpeMergeTable {
  private val hexIds: Array[String] =
    Array.tabulate(128)(i => f"$i%02x")

  /** 2-hex id of an ASCII char (callers guarantee `c < 128` — the
    * token grammar admits only `[a-z0-9]` after folding). */
  def hexId(c: Char): String = hexIds(c)
}
