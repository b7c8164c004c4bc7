package graft

import graft.sources.Warc
import org.apache.spark.sql.functions._

/** WARC source/sink: byte-exact record framing through the text sink,
  * Content-Length payload fidelity, strict malformed-input refusal.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/out"

  test("round trip preserves payload bytes, including CRLFs and unicode") {
    val dir = tmp("warc_rt")
    val rows = Seq(
      ("http://a.com/1", "plain payload"),
      ("http://a.com/2", "embedded\r\n\r\nseparator stays data"),
      ("http://b.org/x", "café déjà vu — 2 byte chars"),
      ("http://b.org/y", ""))
      .toDF("url", "payload")
    Warc.write(rows, dir, "url", "payload")
    val back = Warc.read(spark, dir)
      .select("url", "payload", "n_bytes")
      .as[(String, String, Long)].collect()
      .map { case (u, p, n) => u -> (p, n) }.toMap
    assert(back("http://a.com/2")._1 === "embedded\r\n\r\nseparator stays data")
    assert(back("http://b.org/x")._1 === "café déjà vu — 2 byte chars")
    assert(back("http://b.org/x")._2 ===
      "café déjà vu — 2 byte chars".getBytes("UTF-8").length.toLong)
    assert(back("http://b.org/y") === ("", 0L))
    assert(back.size === 4)
  }

  test("written files are strict WARC/1.0: version line, headers, exact separator") {
    val dir = tmp("warc_strict")
    Warc.write(Seq(("http://e.com/p", "abc")).toDF("url", "payload"),
      dir, "url", "payload")
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    val s = new String(bytes, "UTF-8")
    assert(s.startsWith("WARC/1.0\r\n"))
    assert(s.contains("WARC-Target-URI: http://e.com/p\r\n"))
    assert(s.contains("Content-Length: 3\r\n\r\nabc"))
    // The text sink's row LF completes the record separator exactly.
    assert(s.endsWith("abc\r\n\r\n"))
    // And the strict parser accepts its own writer's bytes.
    assert(Warc.parseRecords(bytes) ===
      Seq(("http://e.com/p", "abc", 3L)))
  }

  test("strict parser refuses malformed input instead of resyncing") {
    def bad(s: String): Unit =
      intercept[IllegalArgumentException] {
        Warc.parseRecords(s.getBytes("UTF-8"))
      }
    bad("HTTP/1.1 200 OK\r\n\r\n")
    bad("WARC/1.0\r\nContent-Length: 10\r\n\r\nshort\r\n\r\n")
    bad("WARC/1.0\r\nWARC-Target-URI: u\r\n\r\nxx\r\n\r\n") // no length
    bad("WARC/1.0\r\nContent-Length: 2\r\nWARC-Target-URI: u\r\n\r\nab\r\nX\n")
  }
}
