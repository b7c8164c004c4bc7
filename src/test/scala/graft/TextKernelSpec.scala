package graft

import graft.functions.TextKernels
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins graft_canon's Unicode behavior to the JDK ground truth (the
  * oracle only exercises the ASCII corpus).
  */
class TextKernelSpec extends SparkSpec {
  import spark.implicits._

  private def canon(s: String): String =
    TextKernels.canon(UTF8String.fromString(s)).toString

  test("canon: NFC merges decomposed accents; case and spacing collapse") {
    val composed = "Héllo   WORLD" // é as one code point
    val decomposed = "Héllo \t\n WORLD" // e + combining acute
    assert(canon(composed) == "héllo world")
    assert(canon(decomposed) == canon(composed),
      "byte-different spellings collapse to one canonical form")
  }

  test("canon: trims, collapses all ws classes, empty stays empty") {
    assert(canon("  a\tb\nc\rd\fe  ") == "a b c d e")
    assert(canon("") == "")
    assert(canon(" \t ") == "")
  }

  test("canon: edge controls outside the collapse class survive (DuckDB trim parity)") {
    // DuckDB trim() strips only ' '; Java String.trim would strip any
    // code point <= U+0020 — e.g. a leading vertical tab — and the two
    // engines would hash-diverge on such texts.
    assert(canon("a ") == "a")
    assert(canon(" a") == "a")
  }

  test("graft_canon expression: null-safe and codegen ≡ kernel") {
    val df = Seq(Some("  Mixed É CASE  "), None, Some("x"))
      .toDF("t")
    val got = df.select(TextAnalysis.canonText(col("t")).as("c"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("mixed é case"), None, Some("x")))
  }
}
