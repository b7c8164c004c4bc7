package graft

import graft.functions.{AhoCorasick, UrlKit}
import graft.ops.ImageHash
import graft.queries.MediaFixtures
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Structural invariants of the round-14 curation tier — all pure
  * kernels, so trials are cheap and run in the hundreds:
  *
  *  - URL canonicalization is IDEMPOTENT (a canonical key re-keys to
  *    itself) and total (never throws on junk);
  *  - blocklist scrubbing is CLOSED (scrubbed text re-scans clean when
  *    the replacement shares no bytes with any pattern) and idempotent;
  *  - dHash is invariant under constant brightness shift and under
  *    the PNG encoder's per-row filter choice (the hash keys content,
  *    not encoding).
  */
object CurationPropertySpec extends Properties("Curation") {

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  private val junk: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(
      ':', '/', '?', '#', '&', '=', '@', '.', ' ', '%', 'é')))
      .map(_.mkString)

  private val urlish: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "ftp")
    host <- Gen.nonEmptyListOf(
      Gen.oneOf("Example", "shop", "WWW", "co", "uk", "github", "io"))
      .map(_.take(4).mkString("."))
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/A/b", "/p%20q")
    q <- Gen.oneOf("", "?b=2&a=1", "?utm_source=x&z=1", "?gclid=0")
    f <- Gen.oneOf("", "#frag")
  } yield s"$scheme://$host$port$path$q$f"

  property("urlcanon is total on junk and idempotent on its output") =
    Prop.forAll(Gen.oneOf(junk, urlish)) { s =>
      val c = UrlKit.canon(u(s)) // must not throw
      c == null || {
        val again = UrlKit.canon(c)
        again != null && again.toString == c.toString &&
          // the domain of a canonical key equals the raw URL's domain
          String.valueOf(UrlKit.registrableDomain(c)) ==
            String.valueOf(UrlKit.registrableDomain(u(s)))
      }
    }

  private val pattern: Gen[String] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  private val text: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)

  property("scrub is closed and idempotent when replacement avoids pattern bytes") =
    Prop.forAll(
      Gen.nonEmptyListOf(pattern).map(_.distinct.take(6)), text) {
      (pats, t) =>
        val ac = AhoCorasick.build(pats)
        val once = ac.scrub(u(t), "#".getBytes("UTF-8"))
        val hitsAfter = ac.hits(once).numElements()
        val twice = ac.scrub(once, "#".getBytes("UTF-8"))
        hitsAfter == 0 && twice.toString == once.toString
    }

  property("scrub removes exactly the covered bytes") =
    Prop.forAll(
      Gen.nonEmptyListOf(pattern).map(_.distinct.take(6)), text) {
      (pats, t) =>
        val ac = AhoCorasick.build(pats)
        // Covered positions computed independently by brute force.
        val covered = Array.fill(t.length)(false)
        for {
          p <- pats
          i <- 0 to t.length - p.length
          if t.regionMatches(i, p, 0, p.length)
          j <- i until i + p.length
        } covered(j) = true
        val runs = covered.zipWithIndex.count { case (c, i) =>
          c && (i == 0 || !covered(i - 1))
        }
        val expectLen = covered.count(!_) + runs
        ac.scrub(u(t), "#".getBytes("UTF-8")).toString.length == expectLen
    }

  private val robotsJunk: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.const("User-agent: *"), Gen.const("User-agent: bot"),
      Gen.const("Disallow: /a"), Gen.const("Allow: /a/b"),
      Gen.const("Disallow:"), Gen.const("# comment"),
      Gen.const("garbage line"), Gen.const(": weird"),
      Gen.alphaNumStr)).map(_.mkString("\n"))

  property("robots evaluation is total and deterministic on junk bodies") =
    Prop.forAll(robotsJunk, Gen.oneOf("/", "/a", "/a/b/c", "", "/x y")) {
      (robots, path) =>
        val v1 = graft.functions.RobotsKit.allowed(u(path), u(robots))
        val v2 = graft.functions.RobotsKit.allowed(u(path), u(robots))
        v1 == v2 // never throws, stable across the parse cache
    }

  private val shiftImage: Gen[(Array[Int], Int)] = for {
    px <- Gen.listOfN(18 * 16, Gen.chooseNum(0, 200)).map(_.toArray)
    shift <- Gen.chooseNum(0, 55)
  } yield (px, shift)

  property("dhash ignores brightness shift and PNG filter choice") =
    Prop.forAll(shiftImage, Gen.chooseNum(0, 4)) {
      case ((px, shift), filt) =>
        def hash(vals: Array[Int], f: Int => Int): Option[Long] = {
          val bytes = MediaFixtures.pngFromPixels(
            18, 16, 1, vals.map(_.toByte), f)
          val Some((w, h, c, p)) =
            graft.ops.Multimodal.pngPixels(bytes): @unchecked
          ImageHash.dhashFromPixels(w, h, c, p)
        }
        val base = hash(px, _ => 0)
        val shifted = hash(px.map(_ + shift), y => (y + filt) % 5)
        base.isDefined && base == shifted
    }
}
