package graft

import graft.ops.Multimodal

/** EXIF GPS audit + scrub: byte-exact walks over the Exif/TIFF
  * structure, closed-loop (strip then re-parse) semantics.
  */
class ExifSpec extends SparkSpec {
  import spark.implicits._

  test("syntheticExifJpeg round-trips GPS through real TIFF bytes") {
    // id 6 → GPS present: lat (6, 6, 42), lon (6, 18, 66) in
    // (deg, min, sec_ms).
    val jpeg = Multimodal.syntheticExifJpeg(6L, "hello".getBytes)
    val gps = Multimodal.exifGpsArcMs(jpeg)
    assert(gps === Some((
      6L * 3600000 + 6L * 60000 + 42L,
      6L * 3600000 + 18L * 60000 + 66L)))
    // id 7 → no GPS, still a valid segment stream.
    assert(Multimodal.exifGpsArcMs(
      Multimodal.syntheticExifJpeg(7L, "x".getBytes)) === None)
  }

  test("stripApp1 removes GPS, keeps the rest of the stream, is idempotent") {
    val jpeg = Multimodal.syntheticExifJpeg(9L, "payload".getBytes)
    val stripped = Multimodal.stripApp1(jpeg)
    assert(Multimodal.exifGpsArcMs(stripped) === None)
    assert(stripped.length < jpeg.length)
    // SOI + COM + EOI survive: the comment payload is still there.
    assert(new String(stripped).contains("payload"))
    assert(Multimodal.stripApp1(stripped).toSeq === stripped.toSeq)
    // A GPS-free stream loses nothing.
    val plain = Multimodal.syntheticExifJpeg(8L, "p".getBytes)
    assert(Multimodal.stripApp1(plain).toSeq === plain.toSeq)
    // Non-JPEG bytes pass through untouched.
    val junk = "not a jpeg".getBytes
    assert(Multimodal.stripApp1(junk).toSeq === junk.toSeq)
  }

  test("stripApp1 copies entropy-coded data after SOS verbatim") {
    // Hand-build SOI | APP1(exif) | SOS | raw bytes incl. 0xFF | EOI:
    // the walker must stop segment-scanning at SOS.
    val exif = Multimodal.syntheticExifJpeg(3L, Array.empty[Byte])
    val app1End = 2 + 2 + 2 + ((exif(4) & 0xff) << 8 | (exif(5) & 0xff)) - 2
    val app1 = exif.slice(2, app1End)
    val sos = Array(0xff, 0xda, 0x00, 0x04, 0x01, 0x02).map(_.toByte)
    val entropy = Array(0x12, 0xff, 0x00, 0x34).map(_.toByte)
    val full = Array(0xff, 0xd8).map(_.toByte) ++ app1 ++ sos ++
      entropy ++ Array(0xff, 0xd9).map(_.toByte)
    val stripped = Multimodal.stripApp1(full)
    assert(Multimodal.exifGpsArcMs(full).nonEmpty)
    assert(Multimodal.exifGpsArcMs(stripped).isEmpty)
    assert(stripped.toSeq ===
      (Array(0xff, 0xd8).map(_.toByte) ++ sos ++ entropy ++
        Array(0xff, 0xd9).map(_.toByte)).toSeq)
  }

  test("exifScan closed loop over a frame") {
    val df = Seq((3L, "a"), (4L, "b"), (6L, "c")).toDF("doc_id", "text")
    val got = Multimodal.exifScan(spark, df, "doc_id", "text")
      .collect().map(e => e.id -> e).toMap
    assert(got(3L).hasGps && got(6L).hasGps && !got(4L).hasGps)
    assert(got(3L).latArcMs === 3L * 3600000 + 3L * 60000 + 21L)
    got.values.foreach { e =>
      assert(!e.gpsAfterStrip, "scrub must remove GPS everywhere")
      if (e.hasGps) assert(e.strippedBytes < e.nBytes)
      else assert(e.strippedBytes === e.nBytes)
    }
  }
}
