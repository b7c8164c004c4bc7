package graft

import graft.functions.TokensKit
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The script-aware token kernel (`graft_tokens`, round 19): exact
  * `[^ ]+` parity on space-delimited text (every ASCII oracle replay
  * depends on it), character-bigram grain within Han/kana/Hangul/Thai
  * runs, and the hand-pinned q416 fixture counts — the single source
  * of truth the oracle literals must keep matching.
  */
class TokensSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] = {
    val a = TokensKit.tokens(UTF8String.fromString(s))
    (0 until a.numElements()).map(i =>
      a.getUTF8String(i).toString)
  }

  private def oldTokens(s: String): Seq[String] =
    "[^ ]+".r.findAllIn(s).toSeq

  test("exact [^ ]+ parity on text without char-grain code points") {
    val cases = Seq(
      "the quick  brown fox ", "  leading and  trailing   ",
      "", " ", "a", "a\tb\nc", "tabs\tstay inside\ttokens",
      "punct! stays, attached.", "héllo wörld — ça va",
      "Правительство объявило, что",
      "أعلنت الحكومة أن القواعد",
      "mixed123 ascii_and-sym/bols")
    for (s <- cases)
      assert(toks(s) === oldTokens(s), s"parity broke on '$s'")
  }

  test("char-grain runs emit overlapping character bigrams") {
    assert(toks("政府宣布") === Seq("政府", "府宣", "宣布"))
    // a single-character run emits the character
    assert(toks("猫") === Seq("猫"))
    // Han + kana share one run (Japanese prose mixes them)
    assert(toks("新しい") === Seq("新し", "しい"))
    // CJK punctuation delimits like a space — never inside a bigram
    assert(toks("政府は、発表") ===
      Seq("政府", "府は", "発表"))
    assert(toks("実施。") === Seq("実施"))
    // fullwidth punctuation delimits; fullwidth letters do not
    assert(toks("完了！次") === Seq("完了", "次"))
    // Latin adjacent to a grain run splits into its own token
    assert(toks("東京ABC駅") === Seq("東京", "ABC", "駅"))
    // Thai is char-grain: one 6-char run (combining marks included)
    // emits 5 overlapping bigrams
    assert(toks("ที่นี่").length === 5)
    // Hangul is char-grain; an ASCII period after a run stands alone
    assert(toks("했다.") === Seq("했다", "."))
  }

  test("tokenCount kernel equals size(tokens) on every regime") {
    val cases = Seq("", " ", "a b c", "政府は新しい規則が来年から施行されると発表しました。",
      "정부는 새로운 규정이 내년부터 시행된다고 발표했다.",
      "mixed 東京 text", "ที่ ของ", "猫")
    for (s <- cases)
      assert(TokensKit.tokenCount(UTF8String.fromString(s)) ===
        toks(s).length, s"count drift on '$s'")
  }

  test("q416 oracle literals: the kernel reproduces langFixtureToks exactly") {
    val got = graft.queries.QueriesExtra8.langFixture.map { case (_, s) =>
      TokensKit.tokenCount(UTF8String.fromString(s))
    }
    assert(got === graft.queries.QueriesExtra8.langFixtureToks,
      "q416's pinned token counts drifted from the kernel")
  }

  test("the expression surface: codegen'd, null-safe, plan-narrow") {
    val df = Seq(Some("a b 政府は"), None, Some(""))
      .toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("t"),
        TextAnalysis.tokenCount(col("text")).as("n"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) === Seq("a", "b", "政府", "府は"))
    assert(rows(0).getInt(1) === 4)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getSeq[String](0) === Seq.empty && rows(2).getInt(1) === 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("minhash near-dups pair near-identical Japanese documents") {
    // Two ja docs differing by one clause + an unrelated ja doc + an
    // unrelated en doc: exactly the near-identical pair must survive
    // (VERDICT r18 task 1's done-criterion — whitespace tokens gave
    // every spaceless doc ONE token, so either everything or nothing
    // paired).
    val a = "毎朝町の人々は川に沿って歩き天気や仕事について話します。" +
      "冬が来る前に終わらせるべき仕事の話をします。"
    val b = "毎朝町の人々は川に沿って歩き天気や仕事について話します。" +
      "冬が来る前に終わらせるべき仕事の話もします。"
    val c = "子供たちは庭で遊んでから家に帰って夕食を食べました。"
    val d = "The students arrived early at the library because they " +
      "wanted to study before the history exam."
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.minhashNearDups(
        df, "doc_id", "text", k = 64, bands = 16, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("multilingual quality: a kept Japanese doc clears the gate that killed it") {
    val ja = "毎朝町の人々は川に沿って歩き天気や仕事について話します。"
    val en = "The students arrived early at the library because they " +
      "wanted to study before the history exam."
    val junk = "tiny text"
    val df = Seq(ja, en, junk).toDF("text")
      .select(col("text"),
        TextAnalysis.qualityScore(col("text")).as("q_en"),
        TextAnalysis.qualityScoreFor(col("text"), Set("en", "ja"))
          .as("q_multi"))
    val rows = df.collect()
    // The r18 failure mode (whitespace tokens → length 0 → quality
    // ≈ 0.33) is dead in BOTH profiles — the script-aware tokenizer
    // alone restores the length and diversity components. The
    // per-language profile additionally awards the stopword component
    // (ja particles), which the English list cannot.
    assert(rows(0).getDouble(1) === 0.6667,
      "EN profile on ja: length + diversity, no stopword credit")
    assert(rows(0).getDouble(2) > rows(0).getDouble(1) &&
      rows(0).getDouble(2) >= 0.9)
    assert(rows(1).getDouble(2) >= 0.5)
    assert(rows(2).getDouble(2) < 0.5)
  }

  test("q425/q428 fixture funnels: curate keeps exactly the labeled docs (both gates)") {
    // One row per cjkFixture variant (ids = variant — the min-id
    // winner structure of the catalog queries, without residue
    // multiplicity): the multilingual gate keeps en+ja and drops the
    // higher variant of each near-dup pair; the defaults gate keeps
    // only en. This is the spec-grain pin behind q425/q428 — it
    // verifies the fixture's LSH pairs actually collide under the
    // fixed hash family (k=64, bands=8), not just their exact
    // Jaccards.
    val df = graft.queries.QueriesExtra10.cjkFixture.zipWithIndex
      .map { case ((_, text, _), i) => (i.toLong, s"src${i % 2}", text) }
      .toDF("doc_id", "source", "text")
    def fates(langs: Set[String]): Map[String, Long] = {
      val curated = (if (langs.isEmpty)
        graft.ops.CorpusPipeline.curate(df)
      else graft.ops.CorpusPipeline.curate(df, langs = langs))
        .collect()
      Map(
        "kept" -> curated.map(_.getAs[Long]("docs_kept")).sum,
        "near_dup" -> curated.map(_.getAs[Long]("dropped_near_dup")).sum,
        "quality" -> curated.map(_.getAs[Long]("dropped_quality")).sum,
        "exact" -> curated.map(_.getAs[Long]("dropped_exact_dup")).sum)
    }
    val multi = fates(Set("en", "ja"))
    assert(multi === Map("kept" -> 5L, "near_dup" -> 2L,
      "quality" -> 2L, "exact" -> 0L), s"multilingual funnel: $multi")
    val defaults = fates(Set.empty)
    assert(defaults === Map("kept" -> 3L, "near_dup" -> 1L,
      "quality" -> 5L, "exact" -> 0L), s"defaults funnel: $defaults")
  }

  test("multilingual gopher gates: CJK prose passes, the EN-only gates fail it") {
    val ja50 = ("毎朝町の人々は川に沿って歩き、天気や仕事について話します。" +
      "冬が来る前に終わらせるべき仕事があると言われています。" +
      "良い本と暖かい火は寒い夜に誰もが必要とするものです。" +
      "政府は学校が開いたままであると発表しました。") * 2
    val df = Seq((1L, ja50)).toDF("doc_id", "text")
    val multi = TextAnalysis.gopherGatesFor(df, "doc_id", "text",
      Set("en", "ja")).collect()(0)
    val en = TextAnalysis.gopherGates(df, "doc_id", "text").collect()(0)
    assert(multi.getAs[Int]("keep") === 1,
      s"multilingual gates failed ja prose: $multi")
    assert(en.getAs[Int]("keep") === 0,
      s"English-profile gates unexpectedly passed ja prose: $en")
  }
}
