package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression for vector-heavy corpora: per-vector absmax
  * int8 scalar quantization (the storage format FAISS/SQ8 and most
  * vector stores use for 4× footprint reduction before ANN search).
  *
  * Entirely narrow per-row array math — no shuffle, no state; at
  * 100 TB the cost is one codegen'd projection on the scan. Arithmetic
  * is pinned to double precision; a float→double cast is exact, so the
  * scale (and therefore every code) is bit-identical in any engine
  * that replays the formula.
  */
object Quantize {

  private def d(c: Column): Column = c.cast("double")

  /** `round(v_i / scale * 127)` with `scale = max|v_i|`; codes lie in
    * [-127, 127]. All-zero (or empty) vectors get `scale = 0` and a
    * zero code per element — dequantization maps them back to exact
    * zeros, no NaN leaks.
    */
  def quantizeInt8(vec: Column): Column = {
    val scale = absmaxScale(vec)
    transform(vec, v =>
      when(scale === 0d, lit(0))
        .otherwise(round(d(v) / scale * 127).cast("int")))
  }

  def absmaxScale(vec: Column): Column =
    coalesce(array_max(transform(vec, v => abs(d(v)))), lit(0d))

  /** Reconstruction of element `q` under `scale`. */
  private def dequant(q: Column, scale: Column): Column =
    d(q) * scale / 127

  /** Quantization audit frame: per vector the scale, an exact integral
    * checksum of the codes, and the worst per-element reconstruction
    * error. `max_abs_err ≤ scale/254` by construction — the assertion
    * any storage-format change must keep.
    *
    * Returns (`idCol`, `n_dims`, `scale`, `q_sum`, `max_abs_err`).
    */
  def quantizeAudit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vec = col(vecCol)
    val scale = absmaxScale(vec)
    val q = quantizeInt8(vec)
    val errs = zip_with(vec, q, (v, qi) => abs(d(v) - dequant(qi, scale)))
    df.select(
      col(idCol),
      size(vec).as("n_dims"),
      scale.as("scale"),
      coalesce(aggregate(q, lit(0L), (acc, x) => acc + x), lit(0L)).as("q_sum"),
      round(coalesce(array_max(errs), lit(0d)), 6).as("max_abs_err"))
  }
}
