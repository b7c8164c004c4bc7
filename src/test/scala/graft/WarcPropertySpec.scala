package graft

import graft.sources.Warc
import org.scalacheck.{Gen, Prop, Properties}

/** Structural invariants of the record-streaming WARC walk — the
  * round-16 headline component, property-tested the way the layout
  * and HTTP kernels are:
  *
  *  - framing round trip: any (url, payload-bytes) list framed as
  *    WARC/1.0 records walks back byte-identical, in order;
  *  - gzip-member invariance: the SAME stream cut into arbitrary
  *    per-member groupings (the Common Crawl per-record layout, the
  *    per-file layout, and everything between) parses identically;
  *  - structural records (warcinfo/request/metadata) interleaved at
  *    random positions never change the emitted content records;
  *  - truncating a well-formed stream at any byte strictly inside a
  *    record FAILS (never silently emits a partial record) — cuts at
  *    record boundaries yield exactly the whole records before the
  *    cut.
  */
object WarcPropertySpec extends Properties("Warc") {

  private def frame(url: String, payload: Array[Byte],
      tpe: String = "response"): Array[Byte] = {
    val head = (s"WARC/1.0\r\nWARC-Type: $tpe\r\n" +
      s"WARC-Target-URI: $url\r\nContent-Length: ${payload.length}" +
      "\r\n\r\n").getBytes("UTF-8")
    head ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def warcinfo(body: String): Array[Byte] = {
    val p = body.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: ${p.length}" +
      "\r\n\r\n").getBytes("UTF-8") ++ p ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def revisit(url: String, refersTo: Option[String]): Array[Byte] = {
    val head = ("WARC/1.0\r\nWARC-Type: revisit\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      refersTo.map(r => s"WARC-Refers-To-Target-URI: $r\r\n")
        .getOrElse("") +
      "Content-Length: 0\r\n\r\n").getBytes("UTF-8")
    head ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def walk(bytes: Array[Byte]): Seq[(String, Seq[Byte])] =
    new Warc.WarcRecordIterator(new java.io.ByteArrayInputStream(bytes))
      .map { case (u, p) => (u, p.toSeq) }.toSeq

  private def walkRevisits(bytes: Array[Byte]): Seq[(String, String)] =
    new Warc.WarcRecordIterator(new java.io.ByteArrayInputStream(bytes),
        emitRevisits = true)
      .map { case (u, r) => (u, new String(r, "UTF-8")) }.toSeq

  private val urlGen: Gen[String] = for {
    host <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    path <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
  } yield s"http://$host.com/$path"

  private val recordGen: Gen[(String, Array[Byte])] = for {
    url <- urlGen
    // arbitrary bytes INCLUDING embedded \r\n\r\n separators
    payload <- Gen.oneOf(
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.const("a\r\n\r\nb".getBytes("UTF-8").toList))
  } yield (url, payload.toArray)

  private val recordsGen: Gen[List[(String, Array[Byte])]] =
    Gen.listOfN(5, recordGen).flatMap(l =>
      Gen.chooseNum(0, 5).map(n => l.take(n)))

  property("framing round trip is byte-identical, in order") =
    Prop.forAll(recordsGen) { recs =>
      val stream = recs.map { case (u, p) => frame(u, p) }
        .foldLeft(Array.empty[Byte])(_ ++ _)
      walk(stream) == recs.map { case (u, p) => (u, p.toSeq) }
    }

  property("any gzip member grouping parses identically") =
    Prop.forAll(recordsGen, Gen.chooseNum(1, 4)) { (recs, groupSize) =>
      val frames = recs.map { case (u, p) => frame(u, p) }
      val members = frames.grouped(groupSize)
        .map(g => gz(g.foldLeft(Array.empty[Byte])(_ ++ _)))
        .foldLeft(Array.empty[Byte])(_ ++ _)
      val plain = frames.foldLeft(Array.empty[Byte])(_ ++ _)
      walk(members) == walk(plain)
    }

  property("interleaved structural records never change the output") =
    Prop.forAll(recordsGen, Gen.chooseNum(0, 3)) { (recs, nInfo) =>
      val content = recs.map { case (u, p) => frame(u, p) }
      val structural =
        (0 until nInfo).map(i => warcinfo(s"software: w$i\r\n")) ++
          recs.take(1).map { case (u, _) =>
            frame(u, s"GET $u HTTP/1.1\r\n".getBytes("UTF-8"), "request")
          }
      // structural records lead the file (the CC layout) and one
      // request rides along
      val stream = (structural ++ content)
        .foldLeft(Array.empty[Byte])(_ ++ _)
      walk(stream) == recs.map { case (u, p) => (u, p.toSeq) }
    }

  property("interleaved revisits: content walk unchanged; revisit walk exact") =
    Prop.forAll(recordsGen, Gen.chooseNum(0, 4)) { (recs, nRev) =>
      // revisit records carry (url, refers_to) and NO body; interleave
      // them at alternating positions among the content records
      val revs = (0 until nRev).map { i =>
        (s"http://re.visit/$i",
          if (i % 2 == 0) Some(s"http://orig.example/$i") else None)
      }
      val contentFrames = recs.map { case (u, p) => frame(u, p) }
      val revFrames = revs.map { case (u, r) => revisit(u, r) }
      // interleave: rev0 content0 rev1 content1 ... (tails appended)
      val interleaved = revFrames.zipAll(contentFrames,
          Array.empty[Byte], Array.empty[Byte])
        .flatMap { case (a, b) => Seq(a, b) }
        .foldLeft(Array.empty[Byte])(_ ++ _)
      val contentOk =
        walk(interleaved) == recs.map { case (u, p) => (u, p.toSeq) }
      val revisitOk = walkRevisits(interleaved) ==
        revs.map { case (u, r) => (u, r.getOrElse("")) }
      contentOk && revisitOk
    }

  property("cuts inside a record fail; cuts at boundaries emit the prefix") =
    Prop.forAll(recordsGen.suchThat(_.nonEmpty)) { recs =>
      val frames = recs.map { case (u, p) => frame(u, p) }
      val stream = frames.foldLeft(Array.empty[Byte])(_ ++ _)
      val boundaries = frames.scanLeft(0)(_ + _.length)
      // every record boundary: clean prefix
      val atBoundaries = boundaries.zipWithIndex.forall { case (cut, k) =>
        walk(stream.take(cut)) ==
          recs.take(k).map { case (u, p) => (u, p.toSeq) }
      }
      // a cut strictly inside the LAST record must throw
      val lastStart = boundaries(recs.size - 1)
      val inside = lastStart + 1 + (stream.length - lastStart - 2) / 2
      val insideFails =
        try { walk(stream.take(inside)); false }
        catch { case _: IllegalArgumentException => true }
      atBoundaries && insideFails
    }
}
