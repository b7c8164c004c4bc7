package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Period-over-period metric decomposition: split each segment's
  * revenue change into a VOLUME effect (more/fewer orders at the old
  * per-order rate) and a RATE effect (the new orders spending
  * differently) — the FP&A "why did the number move" answer, with
  * the identity Δ ≡ volume + rate holding exactly per segment:
  *
  *   Δc = (n₂−n₁)·(c₁/n₁)  +  n₂·(c₂/n₂ − c₁/n₁)
  *
  * Counts and cents are exact integer sums per (segment, period);
  * the two effects are fixed-shape double expressions on them (the
  * q167 recipe), so the decomposition is engine-reproducible.
  * Segments present in only one period contribute their whole change
  * as volume (rate undefined → 0 by convention).
  */
object ChangeDecomposition {

  /** @param df rows with a segment, a period flag (0 = base, 1 =
    *           current), and integer cents
    * @return per segment: n1, n2, c1, c2 (cents), `delta_cents`
    *         (exact), `volume_effect`, `rate_effect` (dollars,
    *         round 2)
    */
  def volumeRate(
      df: DataFrame, segCol: String, periodCol: String,
      centsCol: String): DataFrame = {
    val agg = df.groupBy(col(segCol).as("seg"))
      .agg(
        sum(when(col(periodCol) === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col(periodCol) === 1, 1L).otherwise(0L)).as("n2"),
        sum(when(col(periodCol) === 0, col(centsCol).cast("long"))
          .otherwise(0L)).as("c1"),
        sum(when(col(periodCol) === 1, col(centsCol).cast("long"))
          .otherwise(0L)).as("c2"))
    def d(c: String) = col(c).cast("double")
    val r1 = d("c1") / d("n1")
    val volume = when(col("n1") > 0,
      (d("n2") - d("n1")) * r1 / lit(100.0)).otherwise(d("c2") / lit(100.0))
    val rate = when(col("n1") > 0 && col("n2") > 0,
      d("n2") * (d("c2") / d("n2") - r1) / lit(100.0)).otherwise(lit(0.0))
    agg.select(col("seg"), col("n1"), col("n2"), col("c1"), col("c2"),
      (col("c2") - col("c1")).as("delta_cents"),
      round(volume, 2).as("volume_effect"),
      round(rate, 2).as("rate_effect"))
  }
}
