package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Storage-layout keys: expressions that order rows so files cover
  * small rectangles of the filter space, making min/max data skipping
  * effective on BOTH dimensions (a plain sort helps only its leading
  * column).
  */
object Layout {

  /** 32-bit Z-order (Morton) key over the low 16 bits of two
    * non-negative keys: bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1. Any contiguous zkey range covers a bounded
    * rectangle in (a, b) space — the property data-skipping needs.
    * Built from builtin shift/mask ops only (whole-stage codegen'd,
    * and mirrored term-for-term in oracle SQL — DuckDB has the same
    * operators).
    */
  def zorderKey(a: Column, b: Column): Column = {
    val la = a.bitwiseAND(lit(0xFFFFL))
    val lb = b.bitwiseAND(lit(0xFFFFL))
    (0 until 16).map { i =>
      shiftleft(shiftright(la, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(lb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** N-column Z-order (Morton) key: bit i of column j lands at
    * position `i * k + j`, using the low `63 / k` bits of each
    * non-negative key (k = 2 → 31 bits per column, k = 3 → 21,
    * k = 4 → 15). Same rectangle-covering property as [[zorderKey]],
    * generalized — callers normalize each column into the bit budget
    * first (see [[graft.operators.Snapshots.compact]]'s zOrderBy).
    * Builtin shift/mask ops only: whole-stage codegen'd. */
  def zorderKeyN(cols: Seq[Column]): Column = {
    val k = cols.size
    require(k >= 2 && k <= 4, s"zorderKeyN interleaves 2..4 columns, got $k")
    val bits = 63 / k
    val mask = (1L << bits) - 1
    cols.zipWithIndex.map { case (c, j) =>
      val lc = c.bitwiseAND(lit(mask))
      (0 until bits).map { i =>
        shiftleft(shiftright(lc, i).bitwiseAND(lit(1L)), i * k + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as DuckDB SQL over column expressions `a`
    * and `b` (spliced term-for-term so engine results are
    * bit-identical).
    */
  def zorderKeySql(a: String, b: String): String = {
    val terms = (0 until 16).map { i =>
      s"((((($a) & 65535) >> $i) & 1) << ${2 * i}) | ((((($b) & 65535) >> $i) & 1) << ${2 * i + 1})"
    }
    terms.mkString("(", " | ", ")")
  }
}
