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

  /** DuckDB SQL fragment equivalents (kept adjacent so Spark + oracle
    * can't drift): portableHash(x) ≡
    *   CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
    */
  def duckPortableHash(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  def duckSeededHash(seed: String, x: String): String =
    duckPortableHash(s"CAST($seed AS VARCHAR) || ':' || $x")
}
