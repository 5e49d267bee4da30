package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — the offline eval harness every retrieval
  * change ships with (TREC-style): given a RUN table (query_id, doc_id,
  * rank 1-based) and graded QRELS (query_id, doc_id, rel >= 0), compute
  * per query at cutoff k:
  *  - ndcg_at_k: DCG / ideal-DCG with the exponential gain
  *    (2^rel - 1) / log2(rank + 1) (Järvelin & Kekäläinen, TOIS'02);
  *  - rr_at_k: reciprocal rank of the first relevant hit (0 if none);
  *  - p_at_k: relevant hits in the top k over k;
  *  - recall_at_k: relevant hits in the top k over all relevant.
  * All closed-form and deterministic — both engines reproduce the exact
  * doubles up to 6-dp rounding.
  *
  * Plan shape: one left join of the rank-limited run against qrels on
  * (query_id, doc_id), one groupBy(query_id); the ideal DCG is a window
  * rank over qrels (rel desc, doc_id asc — deterministic ties) plus the
  * same groupBy. Everything shuffles on query_id only; row volume is
  * |runs| + |qrels|, never corpus-sized. Queries missing from either
  * side still get a row (full outer fold, metrics 0) so a broken run
  * that returns nothing scores 0 instead of vanishing from the report.
  */
object RankEval {

  def evaluate(runs: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"cutoff k must be positive, got $k")
    val gain = (rel: org.apache.spark.sql.Column, rank: org.apache.spark.sql.Column) =>
      (pow(lit(2.0), rel.cast("double")) - lit(1.0)) /
        log2(rank.cast("double") + lit(1.0))

    val perQ = runs.filter(col("rank") <= k)
      .join(qrels, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      .groupBy(col("query_id")).agg(
        sum(when(col("rel") > 0, gain(col("rel"), col("rank")))
          .otherwise(lit(0.0))).as("dcg"),
        min(when(col("rel") > 0, col("rank"))).as("first_rel"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits"))

    val ideal = qrels.filter(col("rel") > 0)
      .withColumn("irank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("rel"), asc("doc_id"))))
      .groupBy(col("query_id")).agg(
        sum(when(col("irank") <= k, gain(col("rel"), col("irank")))
          .otherwise(lit(0.0))).as("idcg"),
        count(lit(1)).as("n_rel"))

    perQ.join(ideal, Seq("query_id"), "full_outer")
      .select(col("query_id"),
        round(when(coalesce(col("idcg"), lit(0.0)) > 0,
          coalesce(col("dcg"), lit(0.0)) / col("idcg")).otherwise(lit(0.0)), 6)
          .as("ndcg_at_k"),
        round(when(col("first_rel").isNotNull,
          lit(1.0) / col("first_rel").cast("double")).otherwise(lit(0.0)), 6)
          .as("rr_at_k"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble), 6)
          .as("p_at_k"),
        round(when(coalesce(col("n_rel"), lit(0L)) > 0,
          coalesce(col("hits"), lit(0L)).cast("double") / col("n_rel").cast("double"))
          .otherwise(lit(0.0)), 6).as("recall_at_k"))
  }
}
