package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection, redaction, and per-source reporting — the scrubbing
  * pass every public-web training corpus runs before release (the
  * C4/RefinedWeb-style pipelines document exactly this family:
  * pattern-match structured identifiers, replace with type tags,
  * report rates per source).
  *
  * Detectors are deliberately REGEX-CLOSED (no checksums beyond Luhn,
  * no ML): every pattern below runs identically under Java regex
  * (Spark) and RE2 (DuckDB) — no lookaround, no alternation whose
  * leftmost-first/leftmost-longest semantics could diverge — so the
  * whole scan is oracle-replayable. Card candidates additionally pass
  * the Luhn mod-10 check as a pure higher-order-function expression
  * (codegen'd, no UDF).
  *
  * Scale shape: every operator here is a narrow per-row projection —
  * no shuffle, no state; [[sourceReport]] adds one map-side-combinable
  * aggregate keyed by source. Redaction is conservative by design:
  * ALL 13–19-digit runs are masked (not only Luhn-valid ones) — a
  * release pipeline over-redacts rather than leaking a card with a
  * typo'd check digit.
  *
  * Supersedes [[TextAnalysis.redactPii]]'s one-expression mask (q54)
  * with detection counts, Luhn validation, phones, and reporting; the
  * old form remains for inline scrubbing.
  */
object Pii {

  /** RFC-5322-lite mailbox: local part of word chars + `._%+-`, dotted
    * domain, 2+ letter TLD.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** E.164-style international phone: `+` then 7–15 digits. */
  val phoneRe = "\\+[0-9]{7,15}\\b"

  /** Dotted-quad IPv4, each octet 0–255. */
  val ipv4Re =
    "\\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}" +
      "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\b"

  /** Payment-card candidate: a contiguous 13–19 digit run. */
  val cardRe = "\\b[0-9]{13,19}\\b"

  /** Per-document PII scan. Card candidates are split into Luhn-valid
    * and Luhn-failed counts — the failed ones are almost always order
    * ids / timestamps, and reporting them separately is what lets a
    * release review calibrate the redactor's false-positive cost.
    *
    * @return `idCol`, `n_emails`, `n_phones`, `n_ipv4`,
    *         `n_cards_valid`, `n_cards_invalid`, `has_pii`
    */
  def scan(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol).as("_t"))
      // DSL + lit() patterns, NOT expr(): the SQL parser would eat the
      // regex backslashes ('\b' is a backspace escape in a SQL string).
      .withColumn("_emails", regexp_extract_all(col("_t"), lit(emailRe), lit(0)))
      .withColumn("_phones", regexp_extract_all(col("_t"), lit(phoneRe), lit(0)))
      .withColumn("_ips", regexp_extract_all(col("_t"), lit(ipv4Re), lit(0)))
      .withColumn("_cands", regexp_extract_all(col("_t"), lit(cardRe), lit(0)))
      .withColumn("_valid", expr(
        """filter(_cands, c ->
          |  aggregate(
          |    transform(sequence(1, length(c)), i ->
          |      CASE WHEN i % 2 = 1
          |        THEN CAST(substring(c, length(c) - i + 1, 1) AS INT)
          |        ELSE IF(CAST(substring(c, length(c) - i + 1, 1) AS INT)
          |                  * 2 > 9,
          |                CAST(substring(c, length(c) - i + 1, 1) AS INT)
          |                  * 2 - 9,
          |                CAST(substring(c, length(c) - i + 1, 1) AS INT)
          |                  * 2)
          |      END),
          |    0, (acc, x) -> acc + x) % 10 = 0)""".stripMargin))
      .select(col(idCol),
        size(col("_emails")).as("n_emails"),
        size(col("_phones")).as("n_phones"),
        size(col("_ips")).as("n_ipv4"),
        size(col("_valid")).as("n_cards_valid"),
        (size(col("_cands")) - size(col("_valid"))).as("n_cards_invalid"),
        (size(col("_emails")) + size(col("_phones")) + size(col("_ips")) +
          size(col("_cands")) > 0).as("has_pii"))

  /** Redacted copy of the text: each detector class replaced by its
    * type tag, applied email → ipv4 → phone → card (emails can embed
    * digit runs; ipv4 before the bare-digit card pattern). The Luhn
    * inner sum — index i counts from the RIGHTMOST digit, odd
    * positions pass through, even positions double (−9 above 9) —
    * uses forward-indexed `substring(c, length(c)−i+1, 1)` so the
    * arithmetic is portable (negative-start substring differs across
    * engines). ALL card-length digit runs are masked — conservative
    * over-redaction, see object doc.
    */
  def redact(df: DataFrame, textCol: String,
      outCol: String = "redacted"): DataFrame =
    df.withColumn(outCol,
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), emailRe, "[EMAIL]"),
            ipv4Re, "[IP]"),
          phoneRe, "[PHONE]"),
        cardRe, "[CARD]"))

  /** German-format IBAN candidate: `DE` + 2 check digits + 18-digit
    * BBAN (22 chars). Fixed-length and all-numeric after the country
    * code, so the ISO 7064 mod-97 check needs NO bignum: the 18-digit
    * BBAN fits int64 exactly (< 9.2·10^18), and the rearranged
    * check number BBAN‖1314‖cc reduces stepwise —
    * m1 = bban % 97, m2 = (m1·10⁴ + 1314) % 97,
    * m3 = (m2·10² + cc) % 97, valid ⇔ m3 = 1 — pure codegen'd
    * integer arithmetic, identical in any engine.
    */
  val ibanDeRe = "\\bDE[0-9]{20}\\b"

  /** Per-document IBAN scan with exact mod-97 validation: candidates
    * split into checksum-valid and -failed counts (the calibration
    * split [[scan]] applies to cards). Narrow per-row projection, no
    * shuffle.
    *
    * @return `idCol`, `n_iban_cands`, `n_iban_valid`, `n_iban_invalid`
    */
  def ibanScan(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        regexp_extract_all(col(textCol), lit(ibanDeRe), lit(0)).as("_c"))
      .withColumn("_valid", expr(
        """filter(_c, c ->
          |  (((CAST(substring(c, 5, 18) AS BIGINT) % 97)
          |     * 10000 + 1314) % 97
          |    * 100 + CAST(substring(c, 3, 2) AS BIGINT)) % 97 = 1)"""
          .stripMargin))
      .select(col(idCol),
        size(col("_c")).as("n_iban_cands"),
        size(col("_valid")).as("n_iban_valid"),
        (size(col("_c")) - size(col("_valid"))).as("n_iban_invalid"))

  /** Per-source release report over [[scan]]'s rows: document counts,
    * PII-bearing share, and per-class totals — the table a data-card
    * publishes.
    *
    * @return per source: `n_docs`, `n_docs_with_pii`, `pii_rate`
    *         (round 4), `emails`, `phones`, `ipv4s`, `cards_valid`
    */
  def sourceReport(
      scanned: DataFrame, docs: DataFrame, idCol: String,
      srcCol: String): DataFrame =
    scanned.join(docs.select(col(idCol), col(srcCol)), idCol)
      .groupBy(srcCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("has_pii"), 1L).otherwise(0L)).as("n_docs_with_pii"),
        sum("n_emails").as("emails"),
        sum("n_phones").as("phones"),
        sum("n_ipv4").as("ipv4s"),
        sum("n_cards_valid").as("cards_valid"))
      .withColumn("pii_rate",
        round(col("n_docs_with_pii").cast("double") /
          col("n_docs").cast("double"), 4))
      .select(col(srcCol), col("n_docs"), col("n_docs_with_pii"),
        col("pii_rate"), col("emails"), col("phones"), col("ipv4s"),
        col("cards_valid"))
}
