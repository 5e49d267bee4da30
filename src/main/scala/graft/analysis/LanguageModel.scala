package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * gate every LLM-data pipeline runs (Wenzek et al., "CCNet: Extracting
  * High Quality Monolingual Datasets", LREC 2020 scores CommonCrawl
  * against a KenLM trained on Wikipedia and keeps the low-perplexity
  * tail): train unigram+bigram count tables on a REFERENCE corpus, score
  * every target document by its average Dirichlet-smoothed bigram
  * log-likelihood, and filter on the resulting perplexity.
  *
  * Complements [[TextAnalysis.lmCrossEntropy]], the SELF-trained add-1
  * difficulty signal feeding perplexity buckets and curriculum order:
  * this one is the cross-corpus gate — train on a REFERENCE corpus,
  * score a different target, with tunable Dirichlet mass and OOV floors
  * that keep unseen vocabulary finite (self-scoring never meets OOV).
  *
  * Model (exact, closed-form — both engines reproduce it bit-for-bit up
  * to rounding):
  *  - Laplace unigram: p_u(w) = (c(w) + 1) / (total + |V| + 1) — the +1
  *    classes make p_u strictly positive, so out-of-vocabulary tokens in
  *    a CROSS-corpus scoring never zero a document's likelihood;
  *  - Dirichlet bigram: p(w | v) = (c(v,w) + mu * p_u(w)) / (c(v) + mu);
  *  - document log-likelihood = ln p_u(w_1) + sum_i ln p(w_i | w_{i-1}),
  *    averaged over the kept-token count; perplexity = exp(-avg).
  *
  * Plan shape (the 100 TB story): bigram pairs are derived PER ROW from
  * the kept-token array (zip of two slices — a projection, no
  * pre-shuffle), so TRAINING is two count aggregates whose outputs are
  * LM-sized (≤ |V|, |V|²-bounded), never corpus-sized. SCORING explodes
  * the target's pairs once and joins them against the three LM tables —
  * AQE broadcasts them whenever the model fits (the common case: a
  * quality LM is trained on a bounded reference corpus), degrading to
  * shuffle joins keyed on the pair only when it genuinely doesn't — then
  * one groupBy(doc_id) folds the costs. No driver-side loops; the only
  * collected values are the two scalars (total, |V|).
  */
object LanguageModel {

  /** Unigram counts (term, c) over kept lowercased tokens. */
  def unigrams(docs: DataFrame): DataFrame =
    TextAnalysis.tokens(docs).groupBy(col("term"))
      .agg(count(lit(1)).as("c"))

  /** Bigram counts (prev, cur, c): adjacent kept-token pairs derived
    * per row (two slices zipped), one count aggregate.
    */
  def bigrams(docs: DataFrame): DataFrame = {
    val kt = transform(TextAnalysis.keptTokens(col("text")), t => lower(t))
    docs.select(explode(zip_with(
        slice(kt, lit(1), greatest(size(kt) - 1, lit(0))),
        slice(kt, lit(2), greatest(size(kt) - 1, lit(0))),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("p"))
      .select(col("p.prev").as("prev"), col("p.cur").as("cur"))
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c"))
  }

  /** Score `docs` against the LM trained on `lmDocs`:
    * (doc_id, n_tokens, avg_ll, ppl) with avg_ll rounded to 6 dp and
    * ppl to 4 dp (HALF_UP both engines). Documents with zero kept
    * tokens have no likelihood and are omitted.
    */
  def scoreDocs(docs: DataFrame, lmDocs: DataFrame,
                mu: Double = 1000.0): DataFrame = {
    require(mu > 0, s"mu must be positive, got $mu")
    val uni = unigrams(lmDocs)
    val bi = bigrams(lmDocs)
    // the two model scalars (one tiny aggregate, two longs collected)
    val row = uni.agg(sum(col("c")), count(lit(1))).head()
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val vocab = row.getLong(1)
    val denomU = total.toDouble + vocab.toDouble + 1.0
    // Laplace unigram probability from a (possibly missing) count col
    def pU(c: org.apache.spark.sql.Column) =
      (coalesce(c, lit(0L)).cast("double") + lit(1.0)) / lit(denomU)

    val kt = transform(TextAnalysis.keptTokens(col("text")), t => lower(t))
    val toks = docs.select(col("doc_id"), kt.as("kt"))
      .filter(size(col("kt")) > 0)

    // first-token cost: ln p_u(w_1)
    val first = toks
      .select(col("doc_id"), element_at(col("kt"), 1).as("cur"))
      .join(uni.withColumnRenamed("term", "cur")
        .withColumnRenamed("c", "c_cur"), Seq("cur"), "left")
      .select(col("doc_id"), log(pU(col("c_cur"))).as("cost"))

    // pair costs: ln((c_bi + mu * p_u(cur)) / (c_prev + mu))
    val pairs = toks.select(col("doc_id"), explode(zip_with(
        slice(col("kt"), lit(1), greatest(size(col("kt")) - 1, lit(0))),
        slice(col("kt"), lit(2), greatest(size(col("kt")) - 1, lit(0))),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.cur").as("cur"))
    val pairCosts = pairs
      .join(bi.withColumnRenamed("c", "c_bi"), Seq("prev", "cur"), "left")
      .join(uni.withColumnRenamed("term", "cur")
        .withColumnRenamed("c", "c_cur"), Seq("cur"), "left")
      .join(uni.withColumnRenamed("term", "prev")
        .withColumnRenamed("c", "c_prev"), Seq("prev"), "left")
      .select(col("doc_id"),
        log((coalesce(col("c_bi"), lit(0L)).cast("double") + lit(mu) * pU(col("c_cur"))) /
          (coalesce(col("c_prev"), lit(0L)).cast("double") + lit(mu))).as("cost"))

    val nTokens = toks.select(col("doc_id"), size(col("kt")).cast("long").as("n_tokens"))
    first.unionByName(pairCosts)
      .groupBy(col("doc_id")).agg(sum(col("cost")).as("s"))
      .join(nTokens, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("s") / col("n_tokens"), 6).as("avg_ll"),
        round(exp(-col("s") / col("n_tokens")), 4).as("ppl"))
  }

  /** The CCNet gate itself: keep documents whose perplexity against the
    * reference LM is at most `maxPpl` (high-perplexity = far from the
    * reference distribution = likely noise; NB the inverse tail drops
    * boilerplate — callers pick the band).
    */
  def perplexityFilter(docs: DataFrame, lmDocs: DataFrame, maxPpl: Double,
                       mu: Double = 1000.0): DataFrame =
    docs.join(scoreDocs(docs, lmDocs, mu)
      .filter(col("ppl") <= maxPpl).select(col("doc_id")), Seq("doc_id"))
}
