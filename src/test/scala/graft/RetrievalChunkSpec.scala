package graft

import graft.ops.{Chunking, Quantize, Retrieval}
import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Round-8 corpus operators: BM25 retrieval, fixed-size chunking,
  * int8 quantization, JSONL round-trip.
  */
class RetrievalChunkSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: both-list docs outrank single-list; one-sided ids survive") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val sem = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, sem, "doc_id", c = 60, k = 10)
      .as[(Long, Int, Double)].collect().toSeq
    // doc 20: 1/62 + 1/61 ≈ .032522 beats doc 10's 1/61 ≈ .016393
    assert(got.head._1 == 20L && got.head._2 == 1)
    assert(got.map(_._1).toSet == Set(10L, 20L, 30L, 40L),
      "full-outer: one-sided ids kept with their single term")
    val d10 = got.find(_._1 == 10L).get._3
    assert(math.abs(d10 - 1.0 / 61) < 1e-6)
    assert(got.map(_._2) == (1 to got.length), "dense fused ranks")
  }

  test("bm25TopK: tf and idf ordering, rank ties break by id") {
    val docs = Seq(
      (1L, "spark spark spark pad pad"), // tf=3 for spark
      (2L, "spark pad pad pad pad"),     // tf=1
      (3L, "rare pad pad pad pad"),      // rare term, higher idf
      (4L, "pad pad pad pad pad")        // no query terms → absent
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "rare"), k = 10).collect()
    assert(got.map(_.getLong(0)).toList == List(3L, 1L, 2L))
    assert(got.map(_.getInt(1)).toList == List(1, 2, 3))
    // doc3's single rare hit (df=1) outscores doc1's triple common hit
    // (df=2): idf dominates at equal length. Scores strictly decrease.
    val scores = got.map(_.getDouble(2))
    assert(scores.sliding(2).forall { case Array(a, b) => a > b })
  }

  test("bm25TopK: k cuts the tail deterministically") {
    val docs = (1L to 20L).map(i => (i, "hit pad")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("hit"), k = 5)
      .collect()
    // identical docs → identical scores → ties resolve by ascending id
    assert(got.map(_.getLong(0)).toList == List(1L, 2L, 3L, 4L, 5L))
  }

  test("anchorTextField: in-link texts aggregate per canonical dst page") {
    import graft.ops.WebCorpus
    val docs = Seq(
      // two pages link /b with different texts; one uses a utm variant
      // URL (canon folds it) and one repeats a text (distinct folds it)
      (1L, "http://w.example/a",
        "<a href=\"http://w.example/b\">solar panel guide</a>" +
          "<a href=\"http://w.example/b?utm_source=x\">solar panel guide</a>"),
      (2L, "http://w.example/c",
        "<a href=\"/b\">beta page</a><a href=\"#frag\">self</a>"),
      (3L, "http://w.example/b", "<p>no links</p>"))
      .toDF("doc_id", "url", "html")
    val got = WebCorpus.anchorTextField(docs, "url", "html")
      .as[(String, String)].collect().toMap
    // relative /b resolved against its page; texts distinct + sorted
    assert(got("http://w.example/b") === "beta page solar panel guide")
    // the fragment-only link resolves to the page itself
    assert(got("http://w.example/c") === "self")
  }

  test("anchorTextField caps a hot page at maxTexts by (count desc, text asc)") {
    import graft.ops.WebCorpus
    // Round 18 (VERDICT r17 task 2): one popular page receives 9
    // distinct texts — t5 from THREE linkers, t3/t7 from two each, the
    // rest singletons. At maxTexts = 4 the field keeps {t5, t3, t7} by
    // count and breaks the singleton tie on text asc (t1), then sorts.
    val linkers = Seq(
      "<a href=\"http://hot.example/p\">t5</a>" +
        "<a href=\"http://hot.example/p\">t3</a>" +
        "<a href=\"http://hot.example/p\">t7</a>" +
        "<a href=\"http://hot.example/p\">t9</a>",
      "<a href=\"http://hot.example/p\">t5</a>" +
        "<a href=\"http://hot.example/p\">t3</a>" +
        "<a href=\"http://hot.example/p\">t1</a>" +
        "<a href=\"http://hot.example/p\">t2</a>",
      "<a href=\"http://hot.example/p\">t5</a>" +
        "<a href=\"http://hot.example/p\">t7</a>" +
        "<a href=\"http://hot.example/p\">t4</a>" +
        "<a href=\"http://hot.example/p\">t6</a>" +
        "<a href=\"http://hot.example/p\">t8</a>")
      .zipWithIndex.map { case (h, i) =>
        (i.toLong, s"http://src$i.example/x", h) }
      .toDF("doc_id", "url", "html")
    val capped = WebCorpus.anchorTextField(linkers, "url", "html",
      maxTexts = 4).as[(String, String)].collect().toMap
    assert(capped("http://hot.example/p") === "t1 t3 t5 t7")
    // under the cap, the capped field equals the uncapped one — the
    // q413/q414 fixture (one text per page) rides this equivalence
    val full = WebCorpus.anchorTextField(linkers, "url", "html")
      .as[(String, String)].collect().toMap
    assert(full("http://hot.example/p") === "t1 t2 t3 t4 t5 t6 t7 t8 t9")
  }

  test("anchorFieldFromEdges: bounded per-key state — no unpartitioned window, capped collect") {
    import graft.ops.WebCorpus
    val edges = (1 to 100).map(i =>
      ("http://hot.example/p", f"text$i%03d", (i % 7 + 1).toLong))
      .toDF("dst_url", "anchor_text", "n_links")
    val out = WebCorpus.anchorFieldFromEdges(edges, maxTexts = 8)
    val field = out.as[(String, String)].collect().head._2
    assert(field.split(" ").length === 8)
    // every window in the plan is PARTITIONED (dst_url[, salt]) — the
    // hot page never serializes through a global window task
    val unpart =
      PlanShapeSpec.unpartitionedWindows(out.queryExecution.executedPlan)
    assert(unpart.isEmpty,
      s"unpartitioned window in anchorFieldFromEdges plan: $unpart")
  }

  test("anchor evidence flips the ranking (bm25TopKWithAnchors)") {
    import graft.ops.WebCorpus
    val docs = Seq(
      // body mentions one query term
      (1L, "http://w.example/a", "solar energy systems overview",
        "<p>no links</p>"),
      // body matches nothing — but the web calls its page
      // "solar panel datasheet" (doc 3 links it below)
      (2L, "http://w.example/b", "generic review of tools",
        "<p>no links</p>"),
      (3L, "http://w.example/c", "unrelated filler text here",
        "<a href=\"http://w.example/b\">solar panel datasheet</a>"))
      .toDF("doc_id", "url", "text", "html")
    val terms = Seq("solar", "panel")
    // body-only: doc 1 is the sole scorer
    val bodyOnly = Retrieval.bm25TopK(
      docs.select(col("doc_id"), col("text")), "doc_id", "text", terms)
      .as[(Long, Int, Double)].collect().toSeq
    assert(bodyOnly.head._1 === 1L)
    assert(!bodyOnly.map(_._1).contains(2L))
    // with the anchor field at weight 2, doc 2's two-term anchor
    // outranks doc 1's one-term body — the signal flip the field is for
    val anchors = WebCorpus.anchorTextField(docs, "url", "html")
    val fused = Retrieval.bm25TopKWithAnchors(docs, anchors, "doc_id",
      "text", "url", terms, k = 10, anchorWeight = 2.0)
      .as[(Long, Int, Double)].collect().toSeq
    assert(fused.head._1 === 2L,
      s"anchor evidence should rank doc 2 first, got $fused")
    assert(fused.map(_._1).contains(1L))
    assert(fused.map(_._2) === (1 to fused.length), "dense ranks")
  }

  test("anchor-field BM25 from stored postings is bit-equal to the inline path") {
    import graft.ops.WebCorpus
    val docs = Seq(
      (1L, "http://w.example/a", "solar energy systems overview",
        "<a href=\"http://w.example/b\">solar panel datasheet</a>"),
      (2L, "http://w.example/b", "generic panel review of tools",
        "<a href=\"http://w.example/a\">energy overview</a>"),
      (3L, "http://w.example/c", "solar panel pricing table",
        "<a href=\"http://w.example/b\">cheap panel</a>"))
      .toDF("doc_id", "url", "text", "html")
    val terms = Seq("solar", "panel")
    val anchors = WebCorpus.anchorTextField(docs, "url", "html")
    val inline = Retrieval.bm25TopKWithAnchors(docs, anchors, "doc_id",
      "text", "url", terms, k = 10, anchorWeight = 1.5)
      .as[(Long, Int, Double)].collect().toSeq
    val fromIndex = Retrieval.bm25TopKWithAnchorsFromIndex(
      Retrieval.bm25Postings(docs, "doc_id", "text"),
      Retrieval.bm25CorpusStats(docs, "doc_id", "text"),
      Retrieval.anchorPostings(docs, anchors, "doc_id", "url"),
      Retrieval.anchorCorpusStats(docs, anchors, "doc_id", "url"),
      "doc_id", terms, k = 10, anchorWeight = 1.5)
      .as[(Long, Int, Double)].collect().toSeq
    assert(inline === fromIndex)
    assert(inline.nonEmpty && inline.map(_._2) === (1 to inline.length))
  }

  test("revisitDedupGroups: revisits count captures without payloads") {
    import graft.ops.WebCorpus
    val content = Seq(
      (10L, "http://e.com/p?utm_source=a"), // canon-folds with next
      (11L, "http://e.com/p"),
      (12L, "http://e.com/q"))
      .toDF("doc_id", "url")
    val revisits = Seq(
      ("http://e.com/p?v=2", Some("http://e.com/p")),
      ("http://e.com/q", None), // absent refers-to: revisit of itself
      ("http://e.com/r?v=9", Some("http://old.example/r"))) // content-free
      .toDF("url", "refers_to")
    val got = WebCorpus.revisitDedupGroups(content, revisits,
        "doc_id", "url")
      .orderBy("canon_url")
      .as[(String, Option[Long], Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("http://e.com/p", Some(10L), 2L, 1L, 3L),
      ("http://e.com/q", Some(12L), 1L, 1L, 2L),
      // re-verified page with no content in this cut: null keeper
      ("http://old.example/r", None, 0L, 1L, 1L)))
  }

  test("chunkFixed: cover-the-tail stop rule, overlap, single-chunk floor") {
    val docs = Seq(
      (1L, ""),           // empty → one empty chunk
      (2L, "a" * 200),    // exactly size → one chunk
      (3L, "a" * 201),    // one past → two chunks (tail starts at 150)
      (4L, "a" * 350),    // 1 + ceil(150/150) = 2 chunks
      (5L, "a" * 351)     // 1 + ceil(151/150) = 3 chunks
    ).toDF("doc_id", "text")
    val got = Chunking.chunkFixed(docs, "doc_id", "text", size = 200, overlap = 50)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), sum("chunk_len").as("chars"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((1L, 0L)))
    assert(got(2L) == ((1L, 200L)))
    assert(got(3L) == ((2L, 251L))) // 200 + 51: chars 151..201
    assert(got(4L) == ((2L, 400L)))
    assert(got(5L) == ((3L, 451L)))
  }

  test("chunkFixed: consecutive chunks share exactly `overlap` characters") {
    val text = (0 until 500).map(i => ('a' + i % 26).toChar).mkString
    val chunks = Chunking.chunkFixed(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 200, 50)
      .orderBy("chunk_id").collect().map(_.getString(2))
    chunks.sliding(2).foreach { case Array(a, b) =>
      assert(a.takeRight(50) == b.take(50))
    }
    // reassembly drops each overlap once → original text
    assert(chunks.head + chunks.tail.map(_.drop(50)).mkString == text)
  }

  test("quantizeAudit: codes bounded, checksum integral, error ≤ scale/254") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f)),   // all-zero → scale 0, zero codes
      (3L, Array(1e-8f))          // tiny but nonzero scale
    ).toDF("vec_id", "embedding")
    val got = Quantize.quantizeAudit(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(1L)._1 == 3 && got(1L)._2 == 1.0)
    // codes: 64 + (-127) + 32 = -31; max err 0 (all ratios exact /127?)
    assert(got(1L)._3 == (64 - 127 + 32))
    assert(got(1L)._4 <= 1.0 / 254 + 1e-9)
    assert(got(2L) == ((2, 0.0, 0L, 0.0)))
    assert(got(3L)._3 == 127L) // its own absmax → full-scale code
    // round-trip: dequantized codes reconstruct within the bound
    val q = Quantize.quantizeInt8(col("embedding"))
    val codes = df.filter($"vec_id" === 1).select(q).as[Seq[Int]].head()
    assert(codes == Seq(64, -127, 32))
  }

  test("jsonl round-trip preserves rows and text verbatim") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_spec")
      .toString + "/out"
    val df = Seq(
      (1L, "plain text"),
      (2L, "esc \"quotes\" and\ttabs and \\ slashes"),
      (3L, "unicode ✓ émoji 🚀"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    Jsonl.write(df, tmp)
    val back = Jsonl.read(spark, tmp,
      StructType.fromDDL("doc_id BIGINT, text STRING"))
    val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 4)
    assert(got(2L) == "esc \"quotes\" and\ttabs and \\ slashes")
    assert(got(3L) == "unicode ✓ émoji 🚀")
    assert(got(4L) == null)
  }
}
