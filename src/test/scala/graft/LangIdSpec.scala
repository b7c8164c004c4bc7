package graft

import graft.functions.LangIdKit
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Trained language ID: script-gate languages, the Latin trigram NB on
  * HELD-OUT sentences (none appear in the bundled training samples),
  * `und` floors, and the codegen'd expression surface.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def c(s: String): String = LangIdKit.classify(s)

  test("script-unique languages classify by code points alone") {
    assert(c("Правительство объявило, что новые меры вступят в силу " +
      "в начале следующего года.") === "ru")
    assert(c("政府は新しい規則が来年から施行されると発表しました。") === "ja")
    assert(c("政府宣布新的规定将于明年初开始实施。") === "zh")
    assert(c("정부는 새로운 규정이 내년부터 시행된다고 발표했다.") === "ko")
    assert(c("أعلنت الحكومة أن القواعد الجديدة ستدخل حيز التنفيذ " +
      "العام المقبل.") === "ar")
    assert(c("Η κυβέρνηση ανακοίνωσε ότι οι νέοι κανόνες θα ισχύσουν " +
      "από το επόμενο έτος.") === "el")
    assert(c("הממשלה הודיעה שהכללים החדשים ייכנסו לתוקף בשנה הבאה.")
      === "he")
    assert(c("सरकार ने घोषणा की कि नए नियम अगले वर्ष से लागू होंगे।") === "hi")
    assert(c("รัฐบาลประกาศว่ากฎใหม่จะมีผลบังคับใช้ในปีหน้า") === "th")
    // Japanese is Han + kana mixed — kana presence must beat the Han
    // count even when Han characters dominate the sentence
    assert(c("東京都の新型規制は経済政策の議論を呼んだが、政府は実施を発表した。")
      === "ja")
  }

  test("Latin trigram NB separates the eleven bundled languages (held-out text)") {
    val heldOut = Seq(
      "en" -> ("The students arrived early at the library because " +
        "they wanted to study before the history exam."),
      "de" -> ("Die Studenten kamen früh in die Bibliothek, weil sie " +
        "vor der Geschichtsprüfung lernen wollten."),
      "fr" -> ("Les étudiants sont arrivés tôt à la bibliothèque " +
        "parce qu'ils voulaient étudier avant l'examen d'histoire."),
      "es" -> ("Los estudiantes llegaron temprano a la biblioteca " +
        "porque querían estudiar antes del examen de historia."),
      "it" -> ("Gli studenti sono arrivati presto in biblioteca " +
        "perché volevano studiare prima dell'esame di storia."),
      "pt" -> ("Os estudantes chegaram cedo à biblioteca porque " +
        "queriam estudar antes do exame de história."),
      "nl" -> ("De studenten kwamen vroeg naar de bibliotheek omdat " +
        "ze voor het geschiedenisexamen wilden studeren."),
      "pl" -> ("Dzieci bawiły się w ogrodzie przez całe popołudnie, " +
        "a potem wróciły do domu na kolację z rodzicami."),
      "tr" -> ("Çocuklar bütün öğleden sonra bahçede oynadılar ve " +
        "sonra akşam yemeği için eve döndüler."),
      "fi" -> ("Lapset leikkivät puutarhassa koko iltapäivän ja " +
        "palasivat sitten kotiin syömään illallista vanhempiensa " +
        "kanssa."),
      "ro" -> ("Copiii s-au jucat în grădină toată după-amiaza și " +
        "apoi s-au întors acasă pentru cina cu părinții lor."))
    val misses = heldOut.flatMap { case (exp, s) =>
      val got = c(s)
      if (got == exp) None else Some(s"$exp -> $got ($s)")
    }
    assert(misses.isEmpty, misses.mkString("; "))
  }

  test("too little signal is und, never a guess") {
    assert(c("") === "und")
    assert(c("12345 !!! --- 42") === "und")
    assert(c("ab") === "und")
    assert(c("   \t\n") === "und")
  }

  test("out-of-model Latin languages are und, not a confident wrong label") {
    // Round 18 (VERDICT r17 task 4): a pure argmax over the eleven
    // bundled languages would hand every one of these a CONFIDENT
    // bundled label (parenthesized below — measured pre-margin).
    val outOfModel = Seq(
      // Swedish (was "es"): margins 0.004 toward es/da-like mass
      "Regeringen meddelade att de nya reglerna skulle träda i kraft " +
        "i början av nästa år och gälla alla medborgare i landet.",
      // Danish (was "nl")
      "Regeringen meddelte at de nye regler ville træde i kraft i " +
        "begyndelsen af næste år og gælde for alle borgere.",
      // Norwegian (was "nl")
      "Regjeringen kunngjorde at de nye reglene ville tre i kraft i " +
        "begynnelsen av neste år og gjelde alle innbyggere.",
      // Indonesian (was "nl")
      "Pemerintah mengumumkan bahwa peraturan baru akan mulai berlaku " +
        "awal tahun depan dan berlaku untuk semua warga negara.",
      // Vietnamese — diacritics fold away; margins 0.09 toward pt but
      // sits below the absolute score floor in every table
      "Chính phủ thông báo rằng các quy định mới sẽ có hiệu lực vào " +
        "đầu năm tới và áp dụng cho mọi công dân.",
      // Czech (was "pl")
      "Vláda oznámila, že nová pravidla vstoupí v platnost začátkem " +
        "příštího roku a budou platit pro všechny občany.",
      // Hungarian (was "de")
      "A kormány bejelentette, hogy az új szabályok jövő év elején " +
        "lépnek hatályba és minden állampolgárra vonatkoznak.")
    val wrong = outOfModel.map(c).filter(_ != "und")
    assert(wrong.isEmpty, s"expected und for all, got $wrong")
  }

  test("margin sweep: the und thresholds separate in-model from out-of-model") {
    // The sweep that CHOSE the thresholds (MarginThreshold = 0.065,
    // ScoreFloor = −9.5): measured per-trigram diagnostics on single
    // sentences — the hardest grain; real documents only add signal.
    //   in-model      margin ≥ 0.0855 (pt), best ≥ −9.445 (tr)
    //   out-of-model  margin ≤ 0.0586 except vi (0.0902), whose best
    //                 (−9.574) fails the floor; best ≤ −9.381 (da)
    // Both gates are needed: margin alone loses vi, the floor alone
    // loses da/no (−9.38/−9.40 > −9.5). Assert the separation holds so
    // a profile edit that erodes it fails HERE, not in a curation run.
    val inModel = Seq(
      "The students arrived early at the library because they wanted " +
        "to study before the history exam.",
      "Os estudantes chegaram cedo à biblioteca porque queriam " +
        "estudar antes do exame de história.", // pt — the closest pair
      "Çocuklar bütün öğleden sonra bahçede oynadılar ve sonra akşam " +
        "yemeği için eve döndüler.") // tr — the lowest absolute score
    for (s <- inModel) {
      val (_, best, margin) = LangIdKit.latinDiag(s)
      assert(margin >= 0.08 && best >= -9.46,
        f"in-model sentence lost its margin: best=$best%.4f margin=$margin%.4f ($s)")
    }
    val swedish = "Regeringen meddelade att de nya reglerna skulle " +
      "träda i kraft i början av nästa år och gälla alla medborgare " +
      "i landet."
    val vietnamese = "Chính phủ thông báo rằng các quy định mới sẽ có " +
      "hiệu lực vào đầu năm tới và áp dụng cho mọi công dân."
    val (_, _, svMargin) = LangIdKit.latinDiag(swedish)
    assert(svMargin < 0.05, f"sv margin grew past the gate: $svMargin%.4f")
    val (_, viBest, _) = LangIdKit.latinDiag(vietnamese)
    assert(viBest < -9.55, f"vi best rose past the floor: $viBest%.4f")
  }

  test("diacritic folding: ASCII-stripped text still classifies") {
    assert(c("Les etudiants sont arrives tot a la bibliotheque parce " +
      "qu'ils voulaient etudier avant l'examen d'histoire.") === "fr")
  }

  test("the expression surface is codegen'd and plan-narrow") {
    val df = Seq(
      "The weather is pleasant today and the meeting starts at noon.",
      "Die Katze schläft den ganzen Tag auf dem warmen Sofa im " +
        "Wohnzimmer.",
      "政府宣布新的规定将于明年初开始实施。")
      .toDF("text")
      .select(TextAnalysis.langId(col("text")).as("lang"))
    assert(df.as[String].collect().toSeq === Seq("en", "de", "zh"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
