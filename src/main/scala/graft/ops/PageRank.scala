package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a document graph — link-analysis centrality as a
  * CURATION signal: on a near-duplicate / citation / hyperlink graph,
  * high-rank documents are the well-connected canonical sources and
  * low-rank isolates are one-off noise; Common-Crawl-scale pipelines
  * use exactly this as a quality prior for seed selection and
  * crawl frontier ordering.
  *
  * Standard damped formulation with uniform teleport and dangling-mass
  * redistribution: pr_{i+1}(u) = (1−d)/N + d·(Σ_{v→u} pr_i(v)/deg(v)
  * + D_i/N), D_i = Σ pr_i over zero-out-degree nodes. Fixed iteration
  * count (power iteration converges geometrically at rate d; the
  * oracle unrolls the same rounds, so determinism beats an epsilon
  * stop).
  *
  * Scale shape: per iteration ONE shuffle join (edges × ranks) + one
  * map-side-combinable sum per destination — the BSP round every
  * distributed PageRank (Pregel, GraphX) runs, expressed on DataFrames
  * so AQE/Tungsten stay in play. The dangling mass is a 1-row
  * aggregate broadcast-crossed back (never a driver collect), and
  * lineage is truncated per round with an eager `localCheckpoint` —
  * the iterative-Spark failure mode [[Components]] documents.
  */
object PageRank {

  /** Rank nodes of an UNDIRECTED graph (edges are symmetrized; pass a
    * directed edge list through unchanged if direction matters by
    * symmetrizing upstream — this op treats each input pair as one
    * mutual link).
    *
    * @param nodes one row per node (`idCol`); isolated nodes rank at
    *              the teleport floor plus their dangling share
    * @param iters fixed power-iteration rounds
    * @return (`id`, `pr`) — pr rounded to `scale` decimals, summing to
    *         ~1 over the graph
    */
  def run(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, iters: Int = 5, scale: Int = 6): DataFrame = {
    require(damping > 0 && damping < 1, s"damping in (0,1): $damping")
    require(iters > 0, s"iters must be positive: $iters")
    val ids = nodes.select(col(idCol).cast("long").as("id")).distinct()
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct()
      .persist()
    val deg = sym.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
      .withColumnRenamed("src", "id")
    // N is graph metadata (node count), not data — one count() action.
    val n = ids.count().toDouble
    val d = lit(damping)

    var cur = ids.withColumn("pr", lit(1.0 / n)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val withDeg = cur.join(deg, Seq("id"), "left")
      // Dangling mass: 1-row aggregate, broadcast-crossed — no collect.
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum("pr"), lit(0.0)).as("dmass"))
      val contribs = sym
        .join(withDeg.filter(col("deg").isNotNull)
          .select(col("id").as("src"), (col("pr") / col("deg")).as("c")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum("c").as("contrib"))
      cur = ids
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          ((lit(1.0) - d) / lit(n) +
            d * (coalesce(col("contrib"), lit(0.0)) + col("dmass") / lit(n)))
            .as("pr"))
        .localCheckpoint(true)
    }
    sym.unpersist()
    cur.select(col("id"), round(col("pr"), scale).as("pr"))
  }
}
