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

  /** Score-based fusion — CombSUM / CombMNZ (Fox & Shaw, TREC-2), the
    * other classic hybrid merge: where [[rrf]] uses only positions,
    * these use the SCORES after per-list min-max normalization to
    * [0, 1] (scores across engines are incomparable; within one list
    * they are not). CombSUM sums the normalized scores; CombMNZ
    * multiplies the sum by the number of lists that retrieved the doc
    * (rewarding multi-engine agreement harder than one strong leg).
    *
    * Determinism contract: inputs are the engines' ROUNDED presentation
    * scores; each normalized value is frozen to integer MICRO-units —
    * round(1e6 · (s − min)/(max − min)) — before any summing, so both
    * engines sum exact integers. A degenerate list (max == min: every
    * member equally best) contributes the full 1e6 per member. Ties
    * break to the lower id.
    *
    * Input: one DataFrame per list with `id` and `score`. Output:
    * (id, comb_micro, n_lists, rnk 1-based) top-`topK`.
    *
    * Plan shape: per list ONE tiny (min, max) aggregate broadcast back
    * over the list (top-k bounded by construction); then the rrf plan —
    * union, one exchange on id, TakeOrdered, rank window over ≤ topK
    * rows.
    */
  def combFusion(rankings: Seq[DataFrame], topK: Int = 10,
                 mnz: Boolean = false): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(topK > 0, "topK > 0")
    val all = rankings.map { r =>
      val scored = r.select(col("id").cast("long").as("id"),
        col("score").cast("double").as("s"))
      val mm = scored.agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
      scored.crossJoin(broadcast(mm))
        .select(col("id"),
          round(lit(1e6) * when(col("mx") === col("mn"), lit(1.0))
            .otherwise((col("s") - col("mn")) / (col("mx") - col("mn"))), 0)
            .cast("long").as("micro"))
    }.reduce(_ unionByName _)
    val base = all.groupBy(col("id"))
      .agg(sum(col("micro")).as("s_micro"), count(lit(1)).as("n_lists"))
    val scored =
      if (mnz) base.select(col("id"),
        (col("s_micro") * col("n_lists")).as("comb_micro"), col("n_lists"))
      else base.select(col("id"), col("s_micro").as("comb_micro"),
        col("n_lists"))
    scored.orderBy(desc("comb_micro"), asc("id")).limit(topK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("comb_micro"), asc("id"))).cast("long"))
  }
}
