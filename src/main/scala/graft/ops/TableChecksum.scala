package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent bucketed table checksums — the Merkle-style
  * anti-entropy primitive for replica / cross-engine comparison: two
  * copies of a table agree iff every bucket's (row count, XOR of row
  * fingerprints) pair agrees, and when they disagree the differing
  * buckets localize the damage to 1/buckets of the keyspace without
  * either side shipping a row.
  *
  * Scale shape: one map-side-combinable aggregate per side — each row
  * reduces to (bucket, fingerprint) in the scan projection and only
  * `buckets` tiny rows cross the shuffle; the compare is an equi-join
  * of two bucket tables. XOR is commutative/associative (order- and
  * partitioning-independent) and cannot overflow; the count channel
  * catches what XOR alone cannot (a row duplicated an even number of
  * times XORs to a no-op). Fingerprints are [[SnapshotDiff]]'s
  * portable null-sentinel hash, so any engine reproduces the checksum
  * bit-for-bit.
  */
object TableChecksum {

  /** Per-bucket (count, xor-of-fingerprints) for one table. */
  def checksum(
      df: DataFrame, keyCol: String, contentCols: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(contentCols.nonEmpty, "checksum needs content columns")
    df.select(
        pmod(Hashing.portableHash(col(keyCol).cast("string")),
          lit(buckets.toLong)).as("bucket"),
        SnapshotDiff.fingerprint(keyCol +: contentCols).as("_fp"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), bit_xor(col("_fp")).as("xorsum"))
  }

  /** Compare two copies bucket-by-bucket: full outer join of the two
    * checksum tables (absent buckets read as empty). `match` is true
    * iff both channels agree.
    */
  def compare(
      a: DataFrame, b: DataFrame, keyCol: String,
      contentCols: Seq[String], buckets: Int): DataFrame = {
    val ca = checksum(a, keyCol, contentCols, buckets)
      .withColumnsRenamed(Map("n" -> "n_a", "xorsum" -> "xor_a"))
    val cb = checksum(b, keyCol, contentCols, buckets)
      .withColumnsRenamed(Map("n" -> "n_b", "xorsum" -> "xor_b"))
    ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        (coalesce(col("n_a"), lit(0L)) === coalesce(col("n_b"), lit(0L)) &&
          coalesce(col("xor_a"), lit(0L)) === coalesce(col("xor_b"), lit(0L)))
          .as("is_match"))
  }
}
