/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

/** THE byte-level ASCII tokenizer shared by every expression whose
  * oracle splices `regexp_extract_all(lower(text), '[a-z0-9]+')`:
  * maximal `[a-z0-9]+` runs of the byte-lowercased UTF-8 input.
  * One implementation so [[ShingleStrings]] and [[WinnowFingerprints]]
  * cannot drift apart — their bit-identical agreement is what links
  * shingle-based MinHash to winnowing fingerprints in the oracles.
  *
  * Known divergence vs `lower()` + regex (documented once, here):
  * lowercasing is byte-level ASCII, so the handful of non-ASCII
  * codepoints whose FULL Unicode lowercase is ASCII (U+212A KELVIN
  * SIGN → 'k', U+0130 'İ' → "i̇") tokenize under `lower()`+regex but
  * are token breaks here. No such codepoint appears in the oracle
  * corpora.
  */
object AsciiTokens {

  /** Tokenize raw UTF-8 bytes; non-ASCII bytes are token breaks. */
  def tokenize(bytes: Array[Byte]): java.util.ArrayList[String] = {
    val toks = new java.util.ArrayList[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= bytes.length) {
      val c: Int = if (i < bytes.length) bytes(i) & 0xff else -1
      val lower = if (c >= 'A' && c <= 'Z') c + 32 else c
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (isTok) {
        sb.append(lower.toChar)
      } else if (sb.length > 0) {
        toks.add(sb.toString)
        sb.setLength(0)
      }
      i += 1
    }
    toks
  }
}
