package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al., "Data Selection for Language
  * Models via Importance Resampling", NeurIPS 2023): score every document
  * by the log-likelihood ratio of a TARGET hashed-bigram distribution
  * against the SOURCE (whole-corpus) distribution, so a pretraining
  * pipeline can resample raw data toward a target domain. Features are
  * hashed bigrams (the paper's hashed n-gram model) over the frozen
  * kept-token rule; both distributions are add-one smoothed over the
  * bucket space.
  *
  * Determinism contract: the per-bucket log ratios are frozen to integer
  * MICRO-units (round(lr * 1e6), half away from zero) before any per-doc
  * accumulation, so document scores are exact integer sums — two engines
  * can disagree about float summation order, never about these.
  */
object Dsir {

  /** Hashed-bigram bucket sequence of a text column: bucket i =
    * portableHash(tok_i + " " + tok_i+1) mod nBuckets, over the
    * lowercased kept tokens. Pure array expressions (codegen) — docs
    * with fewer than two kept tokens get an empty feature list, not a
    * descending-`sequence` artifact.
    */
  private[graft] def bigramBuckets(text: Column, nBuckets: Int): Column = {
    val toks = transform(TextAnalysis.keptTokens(text), t => lower(t))
    when(size(toks) < 2, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => Sketches.portableTermHash(
          concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))
          % nBuckets))
  }

  /** Per-doc DSIR importance score against `lang == targetLang` as the
    * target domain. Output: `(doc_id, n_bigrams, dsir_micro,
    * dsir_score)` — `dsir_micro` is the exact integer sum of per-bucket
    * micro-unit log ratios (the rankable quantity), `dsir_score` its
    * 4-dp float rendering.
    *
    * Plan shape: ONE corpus pass builds both bucket histograms (the
    * exploded feature stream partial-aggregates into `nBuckets` rows —
    * a bounded agg, rows independent of N); the 2·nBuckets counts
    * collect to the driver, which freezes the smoothed log ratios into
    * a LITERAL lookup array; scoring is then a zero-shuffle projection
    * (per-row array fold against the literal), exactly the
    * broadcast-centroid pattern of [[Similarity.hardNegatives]]. No
    * join ever touches the corpus.
    */
  def importanceWeights(docs: DataFrame, targetLang: String,
                        nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val feats = docs.select(col("doc_id"), col("lang"),
      bigramBuckets(col("text"), nBuckets).as("bkts"))
    val ex = feats.select(col("lang"), explode(col("bkts")).as("bkt"))
    val counts = ex.groupBy(col("bkt")).agg(
        count(lit(1)).as("cs"),
        count(when(col("lang") === targetLang, lit(1))).as("ct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sTot = counts.valuesIterator.map(_._1).sum
    val tTot = counts.valuesIterator.map(_._2).sum
    val lrMicro: IndexedSeq[Long] = (0 until nBuckets).map { b =>
      val (cs, ct) = counts.getOrElse(b.toLong, (0L, 0L))
      val lr = math.log((ct + 1).toDouble / (tTot + nBuckets)) -
        math.log((cs + 1).toDouble / (sTot + nBuckets))
      BigDecimal(lr * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val lut = array(lrMicro.map(lit): _*)
    feats.select(col("doc_id"),
        size(col("bkts")).cast("long").as("n_bigrams"),
        aggregate(col("bkts"), lit(0L),
          (acc, b) => acc + element_at(lut, b.cast("int") + 1)).as("dsir_micro"))
      .withColumn("dsir_score", round(col("dsir_micro") / 1e6, 4))
  }
}
