package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Encoding-damage (mojibake) detection and repair — the ingest-hygiene
  * stage a web-scale corpus needs before any text gate runs: UTF-8
  * bytes mis-decoded as Latin-1/Windows-1252 turn every accented
  * character into a two-or-three character signature (`é` → `Ã©`,
  * `’` → `â€™`), and those artifacts poison tokenization, language-ID,
  * dedup shingles, and quality scores downstream.
  *
  * Two repair tiers, both per-row scalar expressions (codegen'd, zero
  * shuffle, so the repair pass rides the existing corpus scan at any
  * scale):
  *
  *  - [[repairCommon]]: a BOUNDED table of the most frequent mojibake
  *    digraphs folded into chained `replace` calls. Every engine (and
  *    the DuckDB oracle) reproduces it exactly — this is the
  *    catalog-checked form.
  *  - [[repairRoundTrip]]: the general fix — re-encode as Latin-1 and
  *    re-decode as UTF-8 — gated by a strict shape check so the decode
  *    can never see malformed bytes (Spark 4's `decode` THROWS on
  *    malformed input; there is no `try_decode`). The gate admits only
  *    strings whose non-ASCII content is entirely valid two-byte
  *    UTF-8-in-Latin-1 pairs (lead `Â`/`Ã` = 0xC2/0xC3 followed by a
  *    continuation char in U+0080–U+00BF), which makes the round trip
  *    total. Windows-1252 punctuation artifacts (`â€™`) cannot ride
  *    this path — `€` is not ISO-8859-1-representable and Spark 4
  *    whitelists charsets — so they stay on the [[repairCommon]] table.
  *
  * Detection ([[signatureHits]]) is the length-difference occurrence
  * count per signature — one pass over the string per table entry,
  * no regex engine involved.
  */
object Encoding {

  /** Most common UTF-8-read-as-Latin-1/Win-1252 artifacts, ordered so
    * no entry's key is a substring of a later key's expansion (the
    * fold is therefore order-insensitive on real text). Latin-1
    * two-byte vowels/consonants first, then Windows-1252 punctuation
    * (three-byte UTF-8 sequences whose middle byte lands in the
    * 0x80–0x9F quirk range).
    */
  val signatures: Seq[(String, String)] = Seq(
    "Ã¡" -> "á", "Ã©" -> "é", "Ã¨" -> "è",
    "Ã³" -> "ó", "Ãº" -> "ú", "Ã§" -> "ç",
    "Ã±" -> "ñ", "Ã¶" -> "ö", "Ã¼" -> "ü",
    "Ã¤" -> "ä", "Ã¯" -> "ï",
    "â€™" -> "’", // â€™ → ’
    "â€œ" -> "“") // â€œ → “

  /** Total mojibake-signature occurrences in `c` (long; 0 for null-free
    * clean text, null propagates). Length-difference counting — each
    * term is `(len - len(without sig)) / len(sig)`, exact because the
    * difference is a multiple of the signature length by construction.
    */
  def signatureHits(c: Column): Column =
    signatures.map { case (sig, _) =>
      ((length(c) - length(replace(c, lit(sig), lit("")))) /
        lit(sig.length)).cast("long")
    }.reduce(_ + _)

  /** Bounded-table repair: fold the signature table into chained
    * literal `replace`s. Idempotent on its own output (no expansion
    * re-creates a signature key).
    */
  def repairCommon(c: Column): Column =
    signatures.foldLeft(c) { case (acc, (sig, fix)) =>
      replace(acc, lit(sig), lit(fix))
    }

  /** Strings this shape are exactly the ones where Latin-1 re-encode +
    * UTF-8 re-decode is total AND provably reverses a prior
    * UTF-8-as-Latin-1 mis-decode: ASCII plus valid two-byte pairs.
    */
  private val roundTripSafe =
    "^(?:[\\x00-\\x7F]|[\\u00C2\\u00C3][\\u0080-\\u00BF])*$"

  /** General Latin-1 round-trip repair, applied only when the strict
    * shape gate passes AND the string actually carries damage (at
    * least one two-byte lead present). Rows failing the gate pass
    * through unchanged — `CaseWhen` short-circuits, so the decode
    * never evaluates on unsafe rows.
    */
  def repairRoundTrip(c: Column): Column =
    when(c.isNotNull && c.rlike(roundTripSafe) &&
        (c.contains("Â") || c.contains("Ã")),
      decode(encode(c, "ISO-8859-1"), "UTF-8"))
      .otherwise(c)
}
