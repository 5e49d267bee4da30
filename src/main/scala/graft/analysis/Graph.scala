package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis over DERIVED graphs (the [[Similarity.knnGraph]] edges,
  * near-dup pair graphs): the web-search centrality operator applied to
  * the corpus structures this engine already builds.
  *
  * PageRank here is the exact-integer variant: ranks live in MICRO-units
  * (1e6 = total mass 1 at uniform init), per-edge contributions are
  * integer division `pr div outdeg`, and the damping step is
  * `(inflow * dampNum) div dampDen` — every iteration is pure bounded
  * integer arithmetic, so two engines replay the identical fixpoint
  * trajectory with no float-summation-order exposure (the [[Dsir]]
  * micro-unit discipline applied to an iterative operator). Dangling
  * nodes (outdeg 0) leak their mass, the classic simplification; total
  * mass is therefore non-increasing, never divergent.
  */
object Graph {

  /** `iters` synchronous PageRank rounds over `edges(src, dst)` against
    * the full `nodes(id)` universe (nodes without edges keep the base
    * rank). Output: `(id, pr_micro, pr)` with `pr` the 6-dp rendering.
    *
    * Plan shape: per iteration ONE contribution join keyed by src (the
    * out-degree side is vertex-sized) and ONE dst-keyed partial-agg sum
    * — the standard sparse mat-vec; the node-universe left join keys by
    * id. Nothing materializes on the driver but the node COUNT (one
    * aggregate); iteration count is a fixed small constant, so the
    * lineage stays shallow and Catalyst reuses the edge exchange across
    * rounds.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
               dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must satisfy 0 <= dampNum <= dampDen")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val n = nodes.select(col("id").cast("long").as("id")).distinct()
    val nodeCount = n.count()
    require(nodeCount > 0, "empty node universe")
    def roundL(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val r0 = roundL(1000000.0 / nodeCount)
    val base = roundL((dampDen - dampNum).toDouble * 1000000.0 /
      (dampDen.toDouble * nodeCount))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = n.select(col("id"), lit(r0).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(outdeg, ranks("id") === outdeg("src"))
        .select(col("src"), expr("pr div deg").as("c"))
      val inflow = e.join(contrib, "src")
        .groupBy(col("dst").as("id")).agg(sum(col("c")).as("inflow"))
      ranks = n.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"(coalesce(inflow, 0L) * $dampNum) div $dampDen")).as("pr"))
    }
    ranks.select(col("id"), col("pr").as("pr_micro"),
      round(col("pr") / 1e6, 6).as("pr"))
  }
}
