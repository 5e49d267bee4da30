package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine. All are
  * shuffle-conscious declarative transforms:
  *  - exact dedup is one hash-groupBy;
  *  - MinHash/LSH turns the O(N^2) pair problem into a band-bucket
  *    equi-join (shuffle on band signature; only same-bucket pairs are
  *    materialized);
  *  - embedding near-dup restricts the cross join to LSH buckets at
  *    scale (see Similarity) — the exhaustive variant here is the
  *    small-scale oracle target.
  * md5 is used as the shared deterministic hash family: identical
  * results in Spark and the DuckDB oracles.
  */
object Dedup {

  /** Exact duplicate groups by sha256(text): one row per distinct
    * content, with the group size and the kept (minimum) doc_id.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("content_sha"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))

  /** MinHash signatures over 3-shingles: k independent hash functions
    * h_i(s) = md5(i || '|' || s), signature_i = min over shingles.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 8): DataFrame = {
    val sh = TextAnalysis.shingles(docs)
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(i.toString), lit("|"), col("shingle")))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: band b's signature = md5(h_{rb} .. h_{rb+r-1});
    * docs sharing any band signature become a candidate pair (a < b).
    */
  def lshCandidatePairs(docs: DataFrame, k: Int = 8, bands: Int = 4): DataFrame = {
    val r = k / bands
    val sig = minhashSignatures(docs, k)
    val bandRows = (0 until bands).map { b =>
      val cols = (0 until r).map(i => col(s"h${b * r + i}"))
      sig.select(col("doc_id"), lit(b).as("band"),
        md5(concat_ws("|", cols: _*)).as("band_sig"))
    }.reduce(_ unionByName _)
    val a = bandRows.as("a")
    val bb = bandRows.as("b")
    a.join(bb, col("a.band") === col("b.band") &&
        col("a.band_sig") === col("b.band_sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact 3-shingle Jaccard for given candidate pairs. */
  def jaccard(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val sets = TextAnalysis.shingles(docs)
      .select(col("doc_id"), col("shingle")).distinct()
    val sizes = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sza") + col("szb") - coalesce(col("inter"), lit(0L))), 6).as("jaccard"))
  }

  /** MinHash-LSH near-duplicate pairs with exact Jaccard >= threshold. */
  def nearDuplicates(docs: DataFrame, threshold: Double = 0.7,
                     k: Int = 8, bands: Int = 4): DataFrame =
    jaccard(docs, lshCandidatePairs(docs, k, bands))
      .filter(col("jaccard") >= threshold)

  /** 16-bit SimHash over kept tokens. Bit b of token t = parity of the
    * (b+1)-th hex char of md5(t); the doc's bit b is 1 iff the sum of
    * (2*bit - 1) over its tokens is positive. Deterministic and
    * SQL-mirrorable (a full 64-bit variant would use the same plan shape
    * with a different per-token hash width).
    */
  def simhash16(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(docs)
    val bits = toks.sparkSession.range(16).select(col("id").cast("int").as("bit"))
    toks.crossJoin(bits)
      .select(col("doc_id"), col("bit"),
        when(expr("ascii(substring(md5(term), bit + 1, 1)) % 2") === 1, lit(1L))
          .otherwise(lit(-1L)).as("sign"))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("sign")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, pow(lit(2.0), col("bit")).cast("long"))
        .otherwise(0L)).as("simhash"))
  }

  /** Embedding near-duplicate pairs: exhaustive pairwise cosine >=
    * threshold over `embeddings(vec_id, embedding)`. The scale path
    * bucket-joins on Similarity.lshBuckets first; this exhaustive form is
    * the oracle target at test scale.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double = 0.95): DataFrame = {
    val parts = Similarity.explodeDims(emb)
    val joined = parts.as("x").join(parts.as("y"),
        col("x.dim") === col("y.dim") && col("x.vec_id") < col("y.vec_id"))
      .groupBy(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .agg(sum(col("x.v") * col("y.v")).as("dot"),
        sqrt(sum(col("x.v") * col("x.v"))).as("na"),
        sqrt(sum(col("y.v") * col("y.v"))).as("nb"))
    joined.select(col("vec_a"), col("vec_b"),
        round(col("dot") / (col("na") * col("nb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
