package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Post-retrieval reranking — the diversity stage of a search/curation
  * pipeline. MMR (maximal marginal relevance, Carbonell & Goldstein '98)
  * greedily re-orders a retrieved candidate pool so each pick balances
  * relevance to the query against redundancy with what is already
  * picked:
  *
  *   next = argmax over remaining d of
  *          lambda * rel(d) - (1 - lambda) * max over selected s of sim(d, s)
  *
  * Scale shape — deliberately two-phase, like the reference engine's own
  * query path (distributed per-chunk top-30, then a driver-side merge of
  * <= 30 x chunks rows, SearchEngine's model):
  *  - the RETRIEVAL is distributed and corpus-sized: cosine top-`pool`
  *    via [[Similarity.bruteForceTopK]] (or any ANN store probe — the
  *    pool interface is just (vec_id, rel));
  *  - the RERANK is driver-resident BY DESIGN: MMR is sequentially
  *    greedy (pick i depends on picks 1..i-1), and it operates on a
  *    pool of tens-to-hundreds of candidates, never the corpus. The
  *    pool's vectors arrive through one isin-pruned scan (pool x d
  *    doubles); the greedy loop is O(pool^2) driver arithmetic.
  *
  * Cross-engine determinism (the DuckDB oracle replays the greedy walk
  * as a generated chain of per-step argmax CTEs): relevance comes
  * rounded to 6 dp from the pool query, every pairwise cosine is rounded
  * to 6 dp before use, each step's score is rounded to 6 dp, and argmax
  * ties break to the lowest vec_id — so both engines walk the identical
  * selection sequence.
  */
object Rerank {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    r6(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** MMR top-k of `queryId`'s neighbors: retrieve the `pool` most
    * cosine-similar vectors (distributed), then greedily select k of
    * them by marginal relevance (driver). Returns
    * (rank 1-based, vec_id, mmr_score) in selection order.
    */
  def mmrTopK(emb: DataFrame, queryId: Long, k: Int, pool: Int,
              lambda: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val poolRows = Similarity.bruteForceTopK(emb, queryId, pool)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val rel = poolRows.toMap
    val ids = poolRows.map(_._1)
    val vecs = emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), Similarity.vecD(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.SortedSet(ids: _*)
    while (selected.size < math.min(k, ids.length)) {
      val pick = remaining.iterator.map { id =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => cosine(vecs(id), vecs(s._1))).max
        (id, r6(lambda * rel(id) - (1 - lambda) * maxSim))
      }.minBy { case (id, sc) => (-sc, id) }
      selected += pick
      remaining -= pick._1
    }
    selected.toSeq.zipWithIndex
      .map { case ((id, sc), i) => (i + 1L, id, sc) }
      .toDF("rank", "vec_id", "mmr_score")
  }
}
