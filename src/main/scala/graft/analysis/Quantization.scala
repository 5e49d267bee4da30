package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQ8-style scalar quantization for the embedding store — the classic
  * vector-database compression step (FAISS `SQ8`, pgvector `halfvec`/
  * int8 lineage): each dimension's values are linearly mapped onto
  * `levels` integer codes inside the corpus-wide per-dimension envelope
  * [vmin_d, vmax_d], shrinking a float32 store 4x so far more of the
  * corpus fits executor memory at query time; queries score
  * ASYMMETRICALLY (raw query vector vs midpoint-dequantized corpus
  * vectors — the ADC trick), trading a bounded reconstruction error for
  * the memory win.
  *
  * Scale shape: the envelope is one partial-agg groupBy over exploded
  * dims (shuffle = tasks x d rows, result d rows — driver-tiny like
  * IvfStore's centroids); code/reconstruction are ZERO-SHUFFLE per-row
  * projections against the envelope re-broadcast as array literals
  * (`transform` with index over the embedding array); quantized top-k is
  * the same scan -> project -> TakeOrdered plan as
  * [[Similarity.bruteForceTopK]].
  *
  * Cross-engine determinism: codes are floor() over per-dim scalar IEEE
  * arithmetic written in the same operation order as the DuckDB twin
  * (no summations, so no reassociation risk); reconstructed values are
  * rounded to 6 dp BEFORE any dot product (the hardNegatives centroid
  * lesson), and cosine summation-order noise is absorbed by the final
  * round(…, 6) exactly as in the other ANN oracles.
  */
object Quantization {

  /** Corpus-wide per-dimension envelope (dim 1-based, vmin, vmax). */
  def dimStats(emb: DataFrame): DataFrame =
    Similarity.explodeDims(emb)
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))

  /** The envelope collected to the driver (d rows — tiny by
    * construction, like IvfStore.loadCentroids), dim-ordered.
    */
  private def envelope(emb: DataFrame): (Seq[Double], Seq[Double]) = {
    val rows = dimStats(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    (rows.map(_._2).toSeq, rows.map(_._3).toSeq)
  }

  /** (vec_id, codes array<long>, recon array<double>):
    * code_d  = floor((v - vmin_d) * levels / (vmax_d - vmin_d)) clamped
    *           to levels-1 (v == vmax_d lands on the clamp; a degenerate
    *           dimension vmin_d == vmax_d codes to 0),
    * recon_d = vmin_d + (code_d + 0.5) * (vmax_d - vmin_d) / levels
    *           (midpoint dequantization), rounded to 6 dp.
    * One projection over the scan — no joins, no shuffles.
    */
  def quantize(emb: DataFrame, levels: Int = 256): DataFrame = {
    require(levels > 1, "levels must be > 1")
    val (vmin, vmax) = envelope(emb)
    val lo = typedLit(vmin)
    val hi = typedLit(vmax)
    val codes = transform(Similarity.vecD(col("embedding")), (x, i) => {
      val l = element_at(lo, i + 1)
      val h = element_at(hi, i + 1)
      when(h === l, lit(0L))
        .otherwise(least(floor((x - l) * levels / (h - l)), lit(levels - 1L)))
        .cast("long")
    })
    val recon = (cs: org.apache.spark.sql.Column) => transform(cs, (c, i) => {
      val l = element_at(lo, i + 1)
      val h = element_at(hi, i + 1)
      round(l + (c.cast("double") + 0.5d) * (h - l) / levels, 6)
    })
    Similarity.nonDegenerate(emb)
      .select(col("vec_id"), codes.as("codes"))
      .select(col("vec_id"), col("codes"), recon(col("codes")).as("recon"))
  }

  /** Oracle-facing exploded view: (vec_id, dim 1-based, code, recon). */
  def quantizeExploded(emb: DataFrame, levels: Int = 256): DataFrame =
    quantize(emb, levels)
      .select(col("vec_id"), posexplode(arrays_zip(col("codes"), col("recon"))))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        col("col").getField("codes").as("code"),
        col("col").getField("recon").as("recon"))

  /** Asymmetric quantized top-k (ADC): the RAW query vector scores the
    * midpoint-RECONSTRUCTED corpus vectors by cosine — the production
    * shape where only the compressed store is resident. Same
    * zero-shuffle scan -> project -> TakeOrdered plan as the exact
    * brute force; its result is the recall benchmark against
    * [[Similarity.bruteForceTopK]].
    */
  def quantizedTopK(emb: DataFrame, queryId: Long, k: Int,
                    levels: Int = 256): DataFrame = {
    val q = AnnStore.vectorOf(emb, queryId)
    val nq = math.sqrt(q.map(x => x * x).sum)
    val qlit = typedLit(q.toSeq)
    quantize(emb, levels)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(Similarity.dotCol(col("recon"), qlit) /
          (Similarity.normCol(col("recon")) * lit(nq)), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }
}
