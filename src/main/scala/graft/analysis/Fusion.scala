package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine rankings from engines whose
  * scores are incomparable (BM25 log-odds vs cosine similarity vs
  * RefScore integers) using only the RANK positions — reciprocal-rank
  * fusion, Cormack/Clarke/Buettcher SIGIR'09: score(d) = Σ_lists
  * 1/(k0 + rank_d(list)). The standard way a search stack merges its
  * sparse and dense legs.
  *
  * Determinism contract: each contribution is frozen to integer
  * NANO-units — round(1e9 / (k0 + rank)) — before summing, so engines
  * sum exact integers (the [[Dsir]] micro-unit trick); ties break to
  * the lower id.
  */
object Fusion {

  /** Fuse rankings (each a DataFrame with `id` and `rnk` columns, rank
    * 1-based) into the top-`topK` by RRF score. Output: `(id, rrf_nano,
    * n_lists, rnk)`.
    *
    * Plan shape: inputs are per-query TOP-K lists (bounded by
    * construction — the engines already cut them), so the union is tiny;
    * for corpus-sized rankings the same plan still scales — one exchange
    * on `id` for the sum, a TakeOrdered (not a global sort) for the cut,
    * and the rank window runs over the ≤ topK surviving rows only.
    */
  def rrf(rankings: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 0 && topK > 0, "k0 >= 0, topK > 0")
    val all = rankings
      .map(_.select(col("id").cast("long").as("id"),
        round(lit(1e9) / (col("rnk") + k0), 0).cast("long").as("nano")))
      .reduce(_ unionByName _)
    all.groupBy(col("id"))
      .agg(sum(col("nano")).as("rrf_nano"), count(lit(1)).as("n_lists"))
      .orderBy(desc("rrf_nano"), asc("id")).limit(topK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("rrf_nano"), asc("id"))).cast("long"))
  }
}
