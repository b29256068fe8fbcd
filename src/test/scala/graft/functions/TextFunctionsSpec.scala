package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).collect().head.getAs[T]("v")

  test("tokenCount counts alphanumeric runs") {
    assert(one[Int](TextFunctions.tokenCount($"t"), "Hello, world! 42") === 3)
    assert(one[Int](TextFunctions.tokenCount($"t"), "") === 0)
    assert(one[Int](TextFunctions.tokenCount($"t"), "...!!!") === 0)
  }

  test("tokenCountBpe counts letter runs, digit runs, and punctuation separately") {
    // "ab12,cd" → ab | 12 | , | cd
    assert(one[Int](TextFunctions.tokenCountBpe($"t"), "ab12,cd") === 4)
  }

  test("punct/digit/upper counts") {
    assert(one[Int](TextFunctions.punctCount($"t"), "a,b.c!?") === 4)
    assert(one[Int](TextFunctions.digitCount($"t"), "a1b22c") === 3)
    assert(one[Int](TextFunctions.upperCount($"t"), "AbCd") === 2)
  }

  test("avgTokenLen is mean token length, 0 for token-free text") {
    assert(one[Double](TextFunctions.avgTokenLen($"t"), "ab abcd") === 3.0)
    assert(one[Double](TextFunctions.avgTokenLen($"t"), "!!") === 0.0)
  }

  test("qualityScore is in [0,1], higher for prose than for junk") {
    val prose = "The quick brown fox jumps over the lazy dog and runs to the forest with a friend. " * 5
    val junk = "3485 2384 91 1 3 3333 77 12, 9, 1!!!"
    val qp = one[Double](TextFunctions.qualityScore($"t"), prose)
    val qj = one[Double](TextFunctions.qualityScore($"t"), junk)
    assert(qp > qj)
    assert(qp >= 0.0 && qp <= 1.0 && qj >= 0.0 && qj <= 1.0)
  }

  test("qualityScore counts capitalized stopwords (The/A at sentence start)") {
    // identical text modulo case must score identically
    val a = one[Double](TextFunctions.qualityScore($"t"), "The cat sat on the mat.")
    val b = one[Double](TextFunctions.qualityScore($"t"), "the cat sat on the mat.")
    assert(a === b)
  }

  test("langId identifies clear-cut sentences; und when nothing hits") {
    val cases = Seq(
      "the cat is on the mat and it is happy" -> "en",
      "der Hund ist nicht zu Hause und ich bin mit dem Auto" -> "de",
      "el perro es muy grande y la casa es de un amigo" -> "es",
      "le chien est dans la maison et il est avec nous" -> "fr",
      "我 是 他 的 朋友 他 有 不 一样 的 想法" -> "zh",
      "zzz qqq xxx" -> "und",
      "" -> "und")
    cases.foreach { case (text, expected) =>
      assert(one[String](TextFunctions.langId($"t"), text) === expected, s"for: $text")
    }
  }

  test("fingerprint is normalization-invariant (case, punctuation, whitespace)") {
    val f1 = one[String](TextFunctions.fingerprintMd5($"t"), "Hello,   World!")
    val f2 = one[String](TextFunctions.fingerprintMd5($"t"), "hello world")
    val f3 = one[String](TextFunctions.fingerprintMd5($"t"), "hello there")
    assert(f1 === f2)
    assert(f1 !== f3)
    val x1 = one[Long](TextFunctions.fingerprint64($"t"), "Hello,   World!")
    val x2 = one[Long](TextFunctions.fingerprint64($"t"), "hello world")
    assert(x1 === x2)
  }
}
