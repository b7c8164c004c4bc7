package graft

import graft.ops.ImageHash
import graft.queries.MediaFixtures
import org.apache.spark.sql.functions._

/** dHash perceptual image hashing: gradient-sign semantics, brightness
  * invariance, locality of edits, the band/pair/dedup layers, and the
  * no-shuffle plan shape of the hashing map.
  */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  // 18x16 grayscale: 2x2 blocks pool exactly onto the 9x8 grid.
  private def grayPx(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(18 * 16)(p => f(p % 18, p / 18).toByte)

  test("dhash encodes the horizontal gradient sign") {
    // Strictly increasing left to right: every right neighbor is
    // brighter, so every comparison is false -> hash 0.
    val inc = ImageHash.dhashFromPixels(18, 16, 1, grayPx((x, _) => x * 10))
    assert(inc === Some(0L))
    // Strictly decreasing: every bit set.
    val dec = ImageHash.dhashFromPixels(18, 16, 1, grayPx((x, _) => 250 - x * 10))
    assert(dec === Some(-1L))
  }

  test("dhash is invariant to a constant brightness shift") {
    def f(x: Int, y: Int): Int = (x * 13 + y * 7) % 151
    val a = ImageHash.dhashFromPixels(18, 16, 1, grayPx(f))
    val b = ImageHash.dhashFromPixels(18, 16, 1, grayPx((x, y) => f(x, y) + 99))
    assert(a.isDefined && a === b)
  }

  test("a local edit flips at most the touched block's bit") {
    def f(x: Int, y: Int): Int = (x * 13 + y * 7) % 151
    val base = ImageHash.dhashFromPixels(18, 16, 1, grayPx(f)).get
    // +100 on the top-left 2x2 block only: block (0,0) is the sole
    // changed block and it feeds exactly one comparison, bit 0.
    val blob = ImageHash.dhashFromPixels(18, 16, 1,
      grayPx((x, y) => f(x, y) + (if (x < 2 && y < 2) 100 else 0))).get
    assert(java.lang.Long.bitCount(base ^ blob) <= 1)
  }

  test("too-small images and undersized buffers refuse to hash") {
    assert(ImageHash.dhashFromPixels(8, 8, 1, new Array[Byte](64)) === None)
    assert(ImageHash.dhashFromPixels(18, 16, 1, new Array[Byte](7)) === None)
  }

  test("dhash dataframe decodes real PNG/GIF bytes; junk stays null") {
    def pixels(id: Long): Array[Byte] =
      grayPx((x, y) => ((id * 7 + x * 13 + y * 7) % 151).toInt)
    val rows = Seq(
      (1L, MediaFixtures.pngFromPixels(18, 16, 1, pixels(1), _ => 0)),
      // Same gradient +40 brightness, different PNG filters: the hash
      // must agree with id 1's even though the BYTES differ.
      (2L, MediaFixtures.pngFromPixels(18, 16, 1,
        grayPx((x, y) => ((1L * 7 + x * 13 + y * 7) % 151).toInt + 40),
        y => y % 5)),
      (3L, MediaFixtures.gifBytes(3, 18, 16)),
      (4L, Array[Byte](1, 2, 3)))
      .toDF("id", "bytes")
    val got = ImageHash.dhash(spark, rows)
      .orderBy("id").collect()
    val h1 = got(0).getString(1)
    assert(h1 != null && h1.length === 16)
    assert(got(1).getString(1) === h1, "brightness+filter invariance")
    assert(got(2).getString(1) != null && got(2).getString(1) != h1)
    assert(got(3).getString(1) == null && got(3).isNullAt(2))
    // Bands recompose the hex hash.
    val r = got(0)
    val recomposed = f"${(r.getInt(5).toLong << 48) | (r.getInt(4).toLong << 32) | (r.getInt(3).toLong << 16) | r.getInt(2).toLong}%016x"
    assert(recomposed === h1)
  }

  test("banded pairs find near-dups without all-pairs; dedup groups exact ties") {
    def png(id: Long, shift: Int, blob: Boolean): Array[Byte] =
      MediaFixtures.pngFromPixels(18, 16, 1,
        grayPx((x, y) => ((id * 7 + x * 13 + y * 7) % 151).toInt + shift +
          (if (blob && x < 2 && y < 2) 100 else 0)),
        y => ((id + y) % 5).toInt)
    val rows = Seq(
      (10L, png(1, 0, blob = false)),
      (11L, png(1, 30, blob = false)),  // hamming 0 vs 10
      (12L, png(1, 5, blob = true)),    // hamming <= 1 vs 10/11
      (20L, png(9, 0, blob = false)))   // unrelated content
      .toDF("id", "bytes")
    val hashes = ImageHash.dhash(spark, rows)
    val pairs = ImageHash.nearDupPairs(hashes, maxHamming = 3)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Int)].collect().toSeq
    val inGroup = pairs.filter { case (a, b, _) => a < 20 && b < 20 }
    assert(inGroup.map(p => (p._1, p._2)) === Seq((10L, 11L), (10L, 12L), (11L, 12L)))
    assert(inGroup.collect { case (a, b, h) if a == 10L && b == 11L => h } === Seq(0))
    assert(inGroup.forall(_._3 <= 1))
    val groups = ImageHash.exactGroups(hashes)
      .where(col("n_dups") >= 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(groups.map(g => (g._2, g._3)) === Seq((10L, 2L)))
  }

  test("stored band index: probe finds near-dups, index side plans no exchange") {
    import graft.sources.Layout
    def png(id: Long, shift: Int): Array[Byte] =
      MediaFixtures.pngFromPixels(18, 16, 1,
        grayPx((x, y) => ((id * 7 + x * 13 + y * 7) % 151).toInt + shift),
        _ => 0)
    val standing = Seq((10L, png(1, 0)), (20L, png(9, 0)))
      .toDF("id", "bytes")
    val batch = Seq((30L, png(1, 25)), (40L, png(5, 0)))
      .toDF("id", "bytes")
    Layout.replaceBucketed(spark,
      graft.ops.ImageHash.bandIndexRows(
        graft.ops.ImageHash.dhash(spark, standing)),
      "dhash_bands_t", "band_key", buckets = 4)
    val prev =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = graft.ops.ImageHash.incrementalPairsFromIndex(
        graft.ops.ImageHash.dhash(spark, batch),
        Layout.table(spark, "dhash_bands_t"))
      val got = probe.orderBy("batch_id")
        .as[(Long, Long, Int)].collect().toSeq
      // 30 is 10's brightness-shifted copy (Hamming 0); 40 matches
      // neither standing image within 3 bits.
      assert(got === Seq((30L, 10L, 0)))
      // The index side must ride its band_key bucket layout: the only
      // hash exchanges are the probe side + the candidate distinct.
      val plan = probe.queryExecution.executedPlan.toString
      val reads = "FileScan".r.findAllIn(plan).size
      assert(reads >= 1, plan)
      val idxScanToJoin = plan.split("SortMergeJoin")
      assert(idxScanToJoin.length >= 2, plan)
      // Bucketed side contributes no Exchange between scan and join:
      // total hashpartitioning exchanges = probe shuffle + distinct.
      assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
        s"index side must not re-shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Layout.drop(spark, "dhash_bands_t")
    }
  }

  test("the hashing map plans with no exchange") {
    val rows = Seq((1L, Array[Byte](1))).toDF("id", "bytes")
    val plan = ImageHash.dhash(spark, rows)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
