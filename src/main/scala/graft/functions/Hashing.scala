package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Portable deterministic hashing for dedup / sketch operators.
  *
  * We deliberately do NOT use `xxhash64`/`hash` (Spark-private seeds) —
  * the correctness oracle re-computes these sketches in DuckDB, so the
  * hash must be reproducible in ANSI SQL. md5 is available and
  * bit-identical everywhere; the first 15 hex chars give an unsigned
  * 60-bit integer that fits a BIGINT in both engines.
  *
  * Cost note: md5 is slower than xxhash64 per call, but these hashes run
  * over deduplicated token arrays (narrow, codegen'd `transform` lambdas,
  * no shuffle); at 100 TB the bottleneck is the LSH band shuffle, not
  * the hash. Swap `portableHash` for `xxhash64` in production if oracle
  * portability is not needed — call sites are unchanged.
  */
object Hashing {

  /** 60-bit hash of a string column: BIGINT in [0, 2^60). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: independent hash family member for MinHash. */
  def seededHash(seed: Column, c: Column): Column =
    portableHash(concat(seed.cast("string"), lit(":"), c))

  /** Mersenne prime 2^31 − 1: the universal-family modulus. Products
    * a·h stay under 2^62, so 64-bit arithmetic cannot overflow — which
    * matters because Spark 4's ANSI mode THROWS on bigint overflow.
    */
  val P31: Long = 2147483647L

  /** k-member affine universal hash family over ONE base md5: h_s(x) =
    * (a_s·h(x) + b_s) mod P31. One cryptographic hash per value instead
    * of k (the k-seeded-md5 variant cost 4× the whole minhash stage at
    * sf0.1); the mixes are plain integer ops that stay in codegen.
    */
  def universalHashes(c: Column, k: Int): Column = {
    val h31 = pmod(portableHash(c), lit(P31))
    transform(sequence(lit(0), lit(k - 1)), s => {
      val a = pmod(s.cast("long") * lit(1103515245L) + lit(12345L), lit(P31))
      val b = pmod(s.cast("long") * lit(2654435761L) + lit(1013904223L), lit(P31))
      pmod(a * h31 + b, lit(P31))
    })
  }

  /** DuckDB SQL fragment equivalents (kept adjacent so Spark + oracle
    * can't drift): portableHash(x) ≡
    *   CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
    */
  def duckPortableHash(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  def duckSeededHash(seed: String, x: String): String =
    duckPortableHash(s"CAST($seed AS VARCHAR) || ':' || $x")

  /** universalHashes(x, k)[s] ≡ (with h31 = portableHash(x) % P31):
    *   ((s*1103515245 + 12345) % P31 * h31
    *     + (s*2654435761 + 1013904223) % P31) % P31
    * Both engines compute non-negative operands, so `%` ≡ pmod.
    */
  def duckUniversalHash(s: String, x: String): String =
    s"((($s*1103515245 + 12345) % ${P31}) * (${duckPortableHash(x)} % ${P31})" +
      s" + (($s*2654435761 + 1013904223) % ${P31})) % ${P31}"
}
