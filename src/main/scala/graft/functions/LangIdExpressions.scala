package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained character-trigram language identification — the signal a
  * 100 TB curation pipeline keys shard mixes and language gates off
  * (the stopword-ratio heuristic `langIdHeuristic` mislabels short and
  * non-Latin documents; reference scope ends at the GEM pipeline, so
  * this is extension-tier — VERDICT r16 task 5).
  *
  * Two stages, both deterministic and bundled (the CountryDim /
  * PublicSuffix discipline — data ships in the source, swappable by a
  * data edit, derived from public knowledge only):
  *
  *  1. SCRIPT gate over the first [[LangIdKit.Window]] chars: languages
  *     whose script is (near-)unique — Japanese kana, Hangul, Han,
  *     Cyrillic, Arabic, Greek, Hebrew, Devanagari, Thai — classify by
  *     code-point ranges alone, the standard shortcut (kana presence
  *     next to Han says `ja`, Han without kana says `zh`). No trigram
  *     model separates what the script already separates.
  *  2. LATIN languages (en/de/fr/es/it/pt/nl/pl/tr/fi/ro) run a character-trigram
  *     Naive Bayes over a 27-symbol alphabet (a–z + space, diacritics
  *     folded via NFD so `café`/`cafe` share mass): per-language
  *     log-probability tables are TRAINED AT CLASS INIT from bundled
  *     sample paragraphs with add-one smoothing, and a document scores
  *     Σ log P(trigram | lang) with the argmax winning. Uniform prior
  *     — corpus language mix is exactly what the caller is measuring.
  *
  * Too little signal (under [[LangIdKit.MinLetters]] folded letters and
  * no script hit) → `und` (ISO 639-2 undetermined), never a guess.
  * Total on junk; output is a plan-stable function of the input text.
  */
object LangIdKit {

  private val Window = 4096
  private val MinLetters = 6
  private val A = 27 // a-z + space
  private val Tri = A * A * A

  /** Latin-script languages the trigram model separates, index-aligned
    * with [[logp]].
    */
  private val latinLangs =
    Array("en", "de", "fr", "es", "it", "pt", "nl",
      "pl", "tr", "fi", "ro")

  /** Bundled training text, a few hundred words per language —
    * composed generic prose (no copyrighted corpus), enough for
    * trigram statistics to separate the eleven languages at document
    * grain. Swapping in larger public profiles is a data edit.
    */
  private def sample(lang: String): String = lang match {
    case "en" =>
      "the quick brown fox jumps over the lazy dog while the children " +
      "watch from the garden behind the old stone house. every morning " +
      "the people of the town walk along the river and talk about the " +
      "weather, the news, and the work that must be done before winter " +
      "arrives. it is often said that a good book and a warm fire are " +
      "all anyone needs on a cold evening. the government announced " +
      "that schools would remain open and that teachers should receive " +
      "better pay for their important work. she asked whether the " +
      "results of the study had been published, and he answered that " +
      "they would appear in the journal next month. there is nothing " +
      "more valuable than the time we spend with the people we love."
    case "de" =>
      "der schnelle braune fuchs springt über den faulen hund während " +
      "die kinder aus dem garten hinter dem alten steinhaus zuschauen. " +
      "jeden morgen gehen die menschen der stadt am fluss entlang und " +
      "sprechen über das wetter, die nachrichten und die arbeit, die " +
      "vor dem winter erledigt werden muss. man sagt oft, dass ein " +
      "gutes buch und ein warmes feuer alles sind, was man an einem " +
      "kalten abend braucht. die regierung hat angekündigt, dass die " +
      "schulen geöffnet bleiben und die lehrer für ihre wichtige " +
      "arbeit besser bezahlt werden sollen. sie fragte, ob die " +
      "ergebnisse der studie veröffentlicht worden seien, und er " +
      "antwortete, dass sie nächsten monat in der zeitschrift " +
      "erscheinen würden. es gibt nichts wertvolleres als die zeit, " +
      "die wir mit den menschen verbringen, die wir lieben."
    case "fr" =>
      "le renard brun rapide saute par-dessus le chien paresseux " +
      "pendant que les enfants regardent depuis le jardin derrière la " +
      "vieille maison de pierre. chaque matin, les gens de la ville " +
      "marchent le long de la rivière et parlent du temps, des " +
      "nouvelles et du travail qui doit être fait avant l'arrivée de " +
      "l'hiver. on dit souvent qu'un bon livre et un feu chaleureux " +
      "sont tout ce dont on a besoin par une soirée froide. le " +
      "gouvernement a annoncé que les écoles resteraient ouvertes et " +
      "que les enseignants devraient recevoir un meilleur salaire " +
      "pour leur travail important. elle a demandé si les résultats " +
      "de l'étude avaient été publiés, et il a répondu qu'ils " +
      "paraîtraient dans la revue le mois prochain. il n'y a rien de " +
      "plus précieux que le temps que nous passons avec les gens que " +
      "nous aimons."
    case "es" =>
      "el rápido zorro marrón salta sobre el perro perezoso mientras " +
      "los niños miran desde el jardín detrás de la vieja casa de " +
      "piedra. cada mañana la gente del pueblo camina junto al río y " +
      "habla del tiempo, de las noticias y del trabajo que debe " +
      "hacerse antes de que llegue el invierno. a menudo se dice que " +
      "un buen libro y un fuego cálido son todo lo que alguien " +
      "necesita en una noche fría. el gobierno anunció que las " +
      "escuelas permanecerían abiertas y que los maestros deberían " +
      "recibir un mejor salario por su importante trabajo. ella " +
      "preguntó si los resultados del estudio habían sido publicados, " +
      "y él respondió que aparecerían en la revista el próximo mes. " +
      "no hay nada más valioso que el tiempo que pasamos con las " +
      "personas que queremos."
    case "it" =>
      "la veloce volpe marrone salta sopra il cane pigro mentre i " +
      "bambini guardano dal giardino dietro la vecchia casa di " +
      "pietra. ogni mattina la gente della città cammina lungo il " +
      "fiume e parla del tempo, delle notizie e del lavoro che deve " +
      "essere fatto prima che arrivi l'inverno. si dice spesso che un " +
      "buon libro e un fuoco caldo siano tutto ciò di cui qualcuno ha " +
      "bisogno in una fredda serata. il governo ha annunciato che le " +
      "scuole sarebbero rimaste aperte e che gli insegnanti " +
      "avrebbero dovuto ricevere uno stipendio migliore per il loro " +
      "lavoro importante. lei ha chiesto se i risultati dello studio " +
      "fossero stati pubblicati, e lui ha risposto che sarebbero " +
      "apparsi sulla rivista il mese prossimo. non c'è niente di più " +
      "prezioso del tempo che passiamo con le persone che amiamo."
    case "pt" =>
      "a rápida raposa marrom pula sobre o cão preguiçoso enquanto as " +
      "crianças observam do jardim atrás da velha casa de pedra. " +
      "todas as manhãs as pessoas da cidade caminham ao longo do rio " +
      "e falam sobre o tempo, as notícias e o trabalho que deve ser " +
      "feito antes que o inverno chegue. costuma-se dizer que um bom " +
      "livro e um fogo quente são tudo o que alguém precisa numa " +
      "noite fria. o governo anunciou que as escolas permaneceriam " +
      "abertas e que os professores deveriam receber um salário " +
      "melhor pelo seu trabalho importante. ela perguntou se os " +
      "resultados do estudo tinham sido publicados, e ele respondeu " +
      "que apareceriam na revista no próximo mês. não há nada mais " +
      "valioso do que o tempo que passamos com as pessoas que amamos."
    case "nl" =>
      "de snelle bruine vos springt over de luie hond terwijl de " +
      "kinderen toekijken vanuit de tuin achter het oude stenen huis. " +
      "elke ochtend lopen de mensen van de stad langs de rivier en " +
      "praten over het weer, het nieuws en het werk dat gedaan moet " +
      "worden voordat de winter komt. er wordt vaak gezegd dat een " +
      "goed boek en een warm vuur alles zijn wat iemand nodig heeft " +
      "op een koude avond. de regering kondigde aan dat de scholen " +
      "open zouden blijven en dat de leraren beter betaald zouden " +
      "moeten worden voor hun belangrijke werk. zij vroeg of de " +
      "resultaten van het onderzoek gepubliceerd waren, en hij " +
      "antwoordde dat ze volgende maand in het tijdschrift zouden " +
      "verschijnen. er is niets waardevoller dan de tijd die we " +
      "doorbrengen met de mensen van wie we houden."
    case "pl" =>
      "rząd ogłosił, że nowe przepisy wejdą w życie na początku " +
      "przyszłego roku i będą obowiązywać wszystkich obywateli kraju. " +
      "każdego ranka mieszkańcy miasta spacerują wzdłuż rzeki i " +
      "rozmawiają o pogodzie, wiadomościach oraz pracy, którą trzeba " +
      "wykonać przed nadejściem zimy. często mówi się, że dobra " +
      "książka i ciepły ogień to wszystko, czego człowiek potrzebuje " +
      "w zimny wieczór. zapytała, czy wyniki badania zostały już " +
      "opublikowane, a on odpowiedział, że ukażą się w czasopiśmie w " +
      "przyszłym miesiącu. nie ma nic cenniejszego niż czas spędzony " +
      "z ludźmi, których kochamy. studenci przyszli wcześnie do " +
      "biblioteki, ponieważ chcieli się uczyć przed egzaminem z " +
      "historii."
    case "tr" =>
      "hükümet yeni kuralların gelecek yıldan itibaren tüm " +
      "vatandaşlar için geçerli olacağını açıkladı. her sabah kasaba " +
      "halkı nehir boyunca yürür ve hava durumu, haberler ve kış " +
      "gelmeden önce yapılması gereken işler hakkında konuşur. soğuk " +
      "bir akşamda insanın ihtiyaç duyduğu tek şeyin iyi bir kitap ve " +
      "sıcak bir ateş olduğu söylenir. araştırmanın sonuçlarının " +
      "yayımlanıp yayımlanmadığını sordu ve gelecek ay dergide " +
      "çıkacağını söyledi. sevdiğimiz insanlarla geçirdiğimiz " +
      "zamandan daha değerli hiçbir şey yoktur. öğrenciler tarih " +
      "sınavından önce çalışmak istedikleri için kütüphaneye erken " +
      "geldiler."
    case "fi" =>
      "hallitus ilmoitti, että uudet säännöt tulevat voimaan ensi " +
      "vuoden alusta ja koskevat kaikkia maan kansalaisia. joka aamu " +
      "kaupungin asukkaat kävelevät joen vartta pitkin ja puhuvat " +
      "säästä, uutisista ja työstä, joka on tehtävä ennen talven " +
      "tuloa. usein sanotaan, että hyvä kirja ja lämmin takka ovat " +
      "kaikki mitä ihminen tarvitsee kylmänä iltana. hän kysyi, oliko " +
      "tutkimuksen tulokset jo julkaistu, ja hän vastasi, että ne " +
      "ilmestyvät lehdessä ensi kuussa. mikään ei ole arvokkaampaa " +
      "kuin aika, jonka vietämme rakkaidemme kanssa. opiskelijat " +
      "saapuivat kirjastoon aikaisin, koska he halusivat lukea ennen " +
      "historian koetta."
    case "ro" =>
      "guvernul a anunțat că noile reguli vor intra în vigoare la " +
      "începutul anului viitor și se vor aplica tuturor cetățenilor " +
      "țării. în fiecare dimineață oamenii orașului se plimbă de-a " +
      "lungul râului și vorbesc despre vreme, despre știri și despre " +
      "munca ce trebuie făcută înainte de venirea iernii. se spune " +
      "adesea că o carte bună și un foc cald sunt tot ce are nevoie " +
      "cineva într-o seară rece. ea a întrebat dacă rezultatele " +
      "studiului au fost publicate, iar el a răspuns că vor apărea în " +
      "revistă luna viitoare. nimic nu este mai prețios decât timpul " +
      "petrecut cu oamenii pe care îi iubim. studenții au ajuns " +
      "devreme la bibliotecă pentru că voiau să învețe înainte de " +
      "examenul de istorie."
    case other => throw new IllegalStateException(s"no sample for $other")
  }

  /** Fold to the 27-symbol alphabet: lowercase, NFD diacritic strip
    * (é→e, ñ→n, ü→u …), ß→ss, anything non-a–z → space, runs of space
    * collapsed. Returns at most ~[[Window]] symbols.
    */
  private[graft] def fold(text: String): String = {
    val windowed =
      if (text.length > Window) text.substring(0, Window) else text
    // letters with NO NFD decomposition map explicitly (Polish ł,
    // Turkish dotless ı, Nordic ø/æ, French œ, Icelandic ð/þ) — an
    // unmapped one would fall through as a word boundary and shred
    // exactly the words that identify the language
    val mapped = windowed.toLowerCase(java.util.Locale.ROOT)
      .replace("ß", "ss").replace('ł', 'l').replace('ı', 'i')
      .replace('ø', 'o').replace("æ", "ae").replace("œ", "oe")
      .replace('ð', 'd').replace('þ', 't')
    val de = java.text.Normalizer.normalize(
      mapped, java.text.Normalizer.Form.NFD)
    val sb = new StringBuilder(de.length)
    var prevSpace = true
    var i = 0
    while (i < de.length) {
      val c = de.charAt(i)
      if (c >= 'a' && c <= 'z') { sb.append(c); prevSpace = false }
      else if (Character.getType(c) != Character.NON_SPACING_MARK) {
        // any other symbol is a word boundary; combining marks vanish
        if (!prevSpace) { sb.append(' '); prevSpace = true }
      }
      i += 1
    }
    if (sb.nonEmpty && sb.charAt(sb.length - 1) == ' ')
      sb.setLength(sb.length - 1)
    sb.result()
  }

  private def sym(c: Char): Int = if (c == ' ') 26 else c - 'a'

  /** Per-language trigram log-probability tables, trained once at
    * class init (add-one smoothing over the 27³ space).
    */
  private val logp: Array[Array[Float]] = latinLangs.map { lang =>
    val counts = new Array[Int](Tri)
    val t = fold(sample(lang))
    var i = 0
    while (i + 2 < t.length) {
      counts((sym(t.charAt(i)) * A + sym(t.charAt(i + 1))) * A +
        sym(t.charAt(i + 2))) += 1
      i += 1
    }
    var total = 0L
    var j = 0
    while (j < Tri) { total += counts(j); j += 1 }
    val denom = (total + Tri).toDouble
    val out = new Array[Float](Tri)
    j = 0
    while (j < Tri) {
      out(j) = math.log((counts(j) + 1) / denom).toFloat
      j += 1
    }
    out
  }

  // script bucket indices
  private val Kana = 0; private val Hangul = 1; private val Han = 2
  private val Cyr = 3; private val Arab = 4; private val Greek = 5
  private val Heb = 6; private val Deva = 7; private val Thai = 8
  private val NScripts = 9
  private val scriptLang =
    Array("ja", "ko", "zh", "ru", "ar", "el", "he", "hi", "th")

  private def scriptOf(cp: Int): Int = cp match {
    case c if c >= 0x3040 && c <= 0x30FF => Kana // hiragana + katakana
    case c if (c >= 0xAC00 && c <= 0xD7A3) ||
      (c >= 0x1100 && c <= 0x11FF) ||
      (c >= 0x3130 && c <= 0x318F) => Hangul
    case c if (c >= 0x4E00 && c <= 0x9FFF) ||
      (c >= 0x3400 && c <= 0x4DBF) => Han
    case c if c >= 0x0400 && c <= 0x04FF => Cyr
    case c if (c >= 0x0600 && c <= 0x06FF) ||
      (c >= 0x0750 && c <= 0x077F) => Arab
    case c if c >= 0x0370 && c <= 0x03FF => Greek
    case c if c >= 0x0590 && c <= 0x05FF => Heb
    case c if c >= 0x0900 && c <= 0x097F => Deva
    case c if c >= 0x0E00 && c <= 0x0E7F => Thai
    case _ => -1
  }

  /** The classifier: ISO 639-1 code, or `und` when the text carries
    * too little letter signal to call.
    */
  def classify(text: String): String = {
    // ---- stage 1: script census over the window
    val n = math.min(text.length, Window)
    val buckets = new Array[Int](NScripts)
    var latin = 0
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      val s = scriptOf(cp)
      if (s >= 0) buckets(s) += 1
      else if (Character.isLetter(cp) && cp < 0x0250) latin += 1
      i += Character.charCount(cp)
    }
    var scripted = 0
    var best = -1
    var bestN = 0
    var k = 0
    while (k < NScripts) {
      scripted += buckets(k)
      if (buckets(k) > bestN) { bestN = buckets(k); best = k }
      k += 1
    }
    val letters = scripted + latin
    // The MinLetters floor applies to the SCRIPT branch too (round 19
    // — VERDICT r18 task 5): two ideographs are not enough signal to
    // call a language, any more than two Latin letters are.
    if (letters < MinLetters) return "und"
    if (scripted * 10 >= letters * 3) { // ≥30% non-Latin-script letters
      // Japanese prose mixes Han with kana; kana presence decides.
      // Han with NO kana (or hangul) is `zh` by DOCUMENTED DEFAULT —
      // the CC/CLD convention: kanji-only Japanese (headlines, name
      // lists) is inherently indistinguishable from Chinese at the
      // script tier, and running prose virtually always carries kana
      // (particles/inflection), so the zh default errs only on
      // fragments. Held-out ja/zh/ko cases pin this in LangIdSpec.
      if (buckets(Kana) * 20 >= scripted) return "ja"
      return scriptLang(best)
    }
    // ---- stage 2: Latin trigram Naive Bayes
    val folded = fold(text)
    val nLetters = folded.count(_ != ' ')
    if (nLetters < MinLetters || folded.length < 3) return "und"
    val (bestLang, bestPerTri, marginPerTri) = latinScore(folded)
    // und-margin (round 18): a pure argmax over the eleven bundled
    // languages gives a CONFIDENT wrong label to every unbundled Latin
    // language (Swedish, Danish, Indonesian, Vietnamese-folded, …).
    // Two honesty gates, both per-trigram-normalized so length cancels:
    // the winner must beat the runner-up by a real margin (out-of-model
    // text scores near-uniformly badly across all tables), and the
    // winner's absolute log-prob must clear a floor (out-of-model text
    // rides mostly-unseen trigrams near the smoothing floor in EVERY
    // table). Thresholds chosen by the LangIdSpec margin sweep.
    if (marginPerTri < MarginThreshold || bestPerTri < ScoreFloor) "und"
    else latinLangs(bestLang)
  }

  /** Minimum per-trigram (best − runner-up) log-prob margin before the
    * Latin argmax is trusted; below it the verdict is `und`. LangIdSpec
    * sweep over single sentences: in-model ≥ 0.0855 (pt, the closest
    * pair), out-of-model ≤ 0.0586 — except Vietnamese-folded, which
    * margins 0.09 toward pt but fails [[ScoreFloor]].
    */
  private val MarginThreshold = 0.065
  /** Minimum per-trigram best log-prob. The bundled samples are a few
    * hundred words, so even matching text scores near the add-one
    * smoothing floor (log(1/(total+27³)) ≈ −9.92; a seen-once trigram
    * ≈ −9.23): in-model sentences measure ≥ −9.45 (tr), out-of-model
    * text rides mostly-unseen trigrams in EVERY table and the farthest
    * ones (vi/cs/hu) sit ≤ −9.57.
    */
  private val ScoreFloor = -9.5

  /** Latin-NB inner scorer over an already-[[fold]]ed window:
    * (argmax index, best per-trigram log-prob, per-trigram margin to
    * the runner-up). Exposed for the LangIdSpec threshold sweep.
    */
  private[graft] def latinScore(folded: String): (Int, Double, Double) = {
    val nTri = folded.length - 2
    // Guard the <3-char window (ADVICE r18): [[classify]] never sends
    // one here, but the latinDiag tuning hook can — a 0/negative
    // trigram count would divide the diagnostics into NaN/Infinity
    // and silently corrupt a future threshold sweep.
    require(nTri > 0,
      s"latinScore needs >= 3 folded chars, got ${folded.length}")
    var bestLang = 0
    var bestScore = Double.NegativeInfinity
    var second = Double.NegativeInfinity
    var l = 0
    while (l < latinLangs.length) {
      val table = logp(l)
      var score = 0.0
      var j = 0
      while (j + 2 < folded.length) {
        score += table((sym(folded.charAt(j)) * A +
          sym(folded.charAt(j + 1))) * A + sym(folded.charAt(j + 2)))
        j += 1
      }
      if (score > bestScore) {
        second = bestScore; bestScore = score; bestLang = l
      } else if (score > second) second = score
      l += 1
    }
    (bestLang, bestScore / nTri, (bestScore - second) / nTri)
  }

  /** Test/tuning hook: fold + [[latinScore]] in one call. */
  private[graft] def latinDiag(text: String): (String, Double, Double) = {
    val (i, b, m) = latinScore(fold(text))
    (latinLangs(i), b, m)
  }

  /** Codegen entry point. */
  def langId(text: UTF8String): UTF8String =
    UTF8String.fromString(classify(text.toString))
}

/** `graft_langid(text)` → ISO 639-1 code via [[LangIdKit.classify]]
  * (script gate + bundled char-trigram Naive Bayes for Latin
  * languages); `und` when the text carries too little letter signal.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_langid expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"

  override def nullSafeEval(text: Any): Any =
    LangIdKit.langId(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.LangIdKit.langId($t)")

  override protected def withNewChildInternal(
      newChild: Expression): LangIdExpr = copy(child = newChild)
}
