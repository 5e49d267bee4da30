package graft.index

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Trigram term-dictionary sidecar — wildcard term lookup for the code
  * corpus, the Google-Code-Search primitive (Cox's codesearch trigram
  * model) applied to the index's vocabulary: `sp*k` finds `spark`
  * without scanning the posting store. The reference engine has no
  * wildcard path (its dictionary is an exact-probe hash,
  * index/HashBlob.h:341-399); this is the missing front-end feature a
  * code search engine needs, built Spark-first.
  *
  * Model: each vocabulary term contributes the distinct 3-substrings of
  * '^' + term + '$' (sentinels give every term, even 1-char, at least
  * one trigram and make prefix/suffix fragments indexable). A wildcard
  * pattern splits on '*' into literal fragments; fragments of length
  * >= 3 yield REQUIRED trigrams. Candidate terms = those carrying every
  * required trigram (an AND over trigram posting lists); a final
  * regex verify removes false positives. No false negatives by
  * construction: a term matching the pattern contains every literal
  * fragment at the right anchors, hence every required trigram.
  *
  * Scale shape: the sidecar is VOCABULARY-sized (|terms| ≈ millions at
  * 100 TB, vs trillions of postings) and partitioned by a portable
  * trigram hash bucket, so a probe reads only the required trigrams'
  * bucket partitions (PartitionFilters) and the groupBy runs over the
  * candidate rows only. Patterns with no fragment >= 3 chars fall back
  * to a full vocabulary regex scan — still vocab-sized, the same
  * fallback Cox's codesearch takes.
  *
  * Staleness: appendBuild can introduce NEW vocabulary, and a missing
  * term is a false negative — the one failure mode the model forbids.
  * Meta records the covered chunk high-water; a stale probe unions in a
  * regex scan of ONLY the uncovered tail chunks' terms (work ∝ delta),
  * and [[refresh]] folds exactly the missing tail terms into their
  * bucket partitions.
  */
object TrigramSidecar {

  def triDir(outDir: String) = s"$outDir/trigram"
  def triMetaDir(outDir: String) = s"$outDir/trigram_meta"

  def exists(spark: SparkSession, outDir: String): Boolean =
    IndexBuilder.pathExists(spark, triMetaDir(outDir))

  /** Distinct trigrams of '^' + term + '$' as a Column (array<string>).
    * Row-identical to [[trigramsScalar]] (TrigramSpec pins it).
    */
  private[graft] def trigramsCol(term: Column): Column = {
    val padded = concat(lit("^"), term, lit("$"))
    array_distinct(transform(
      sequence(lit(1), length(padded) - 2),
      i => padded.substr(i, lit(3))))
  }

  /** Scalar twin of [[trigramsCol]] — used driver-side to derive probe
    * trigrams and bucket routes.
    */
  def trigramsScalar(s: String): Seq[String] = {
    val p = "^" + s + "$"
    (0 to p.length - 3).map(i => p.substring(i, i + 3)).distinct
  }

  /** Bucket route of a trigram: the row-0 portable CMS hash (scalar
    * twin BloomSidecar.bitPosScalar, already spec-pinned equal to the
    * Column side).
    */
  def bucketScalar(tri: String, nBuckets: Int): Long =
    BloomSidecar.bitPosScalar(tri, 0L, nBuckets)

  /** Required trigrams of a '*' wildcard pattern: pad with sentinels,
    * split on '*', take every length>=3 fragment's 3-substrings.
    * Empty = the pattern constrains fewer than 3 consecutive chars
    * anywhere → full-vocabulary fallback.
    */
  def requiredTrigrams(pattern: String): Seq[String] = {
    require(pattern.nonEmpty && !pattern.contains("^") && !pattern.contains("$"),
      s"pattern must be non-empty without sentinels: '$pattern'")
    ("^" + pattern + "$").split("\\*", -1).toSeq
      .filter(_.length >= 3)
      .flatMap(f => (0 to f.length - 3).map(i => f.substring(i, i + 3)))
      .distinct
  }

  /** The anchored regex a pattern verifies with ('*' → '.*'; terms are
    * all-alpha lowercase by the frozen tokenizer, so nothing else needs
    * escaping).
    */
  def patternRegex(pattern: String): String =
    "^" + pattern.replace("*", ".*") + "$"

  /** Body-term vocabulary of the chunks in `chunkPred` (or all). */
  private def vocab(spark: SparkSession, outDir: String,
                    chunkPred: Option[Column]): DataFrame = {
    val posts = IndexStore.readPostings(spark, outDir).toDF()
    chunkPred.fold(posts)(p => posts.filter(p))
      .filter(!col("term").startsWith("#"))
      .select(col("term")).distinct()
  }

  private def gridOf(terms: DataFrame, nBuckets: Int): DataFrame =
    terms.select(col("term"), explode(trigramsCol(col("term"))).as("tri"))
      .select(graft.analysis.Sketches.cmsCol(col("tri"), lit(0L), nBuckets)
        // int: partition-column readback infers INT from the dir names,
        // so write the same type the reads will see
        .cast("int").as("bucket"), col("tri"), col("term"))

  private def coveredMaxChunk(spark: SparkSession, outDir: String): Long = {
    import spark.implicits._
    IndexStore.readStats(spark, outDir).map(_.chunk).reduce(math.max)
  }

  /** Build the sidecar over the index's current vocabulary. One
    * vocab-sized distinct (the information floor) + a bounded trigram
    * fan-out (≤ termLen+2 per term, < 21 by the frozen token rule);
    * written partitioned by bucket so probes prune.
    */
  def build(spark: SparkSession, outDir: String, nBuckets: Int = 32): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    gridOf(vocab(spark, outDir, None), nBuckets)
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(triDir(outDir))
    writeMeta(spark, outDir, nBuckets)
  }

  private def writeMeta(spark: SparkSession, outDir: String,
                        nBuckets: Int): Unit =
    spark.createDataFrame(Seq((nBuckets,
        IndexBuilder.docIdHighWater(spark, outDir),
        coveredMaxChunk(spark, outDir))))
      .toDF("nBuckets", "builtDocMax", "coveredMaxChunk")
      .write.mode(SaveMode.Overwrite).parquet(triMetaDir(outDir))

  /** (nBuckets, builtDocMax, coveredMaxChunk). Staleness is detected on
    * builtDocMax — appendBuild can grow the covered BOUNDARY chunk
    * without adding chunks, so a chunk-level check alone would miss new
    * vocabulary; the tail read then starts AT coveredMaxChunk (>=, not
    * >) for the same reason.
    */
  private def readMeta(spark: SparkSession, outDir: String): (Int, Long, Long) = {
    val r = spark.read.parquet(triMetaDir(outDir)).head()
    (r.getAs[Int]("nBuckets"), r.getAs[Long]("builtDocMax"),
      r.getAs[Long]("coveredMaxChunk"))
  }

  /** Fold the vocabulary of chunks the sidecar has not covered into the
    * grid — append-only, new terms land in their bucket partitions, and
    * work stays ∝ the maintenance delta (tail-chunk postings only).
    */
  def refresh(spark: SparkSession, outDir: String): Unit = {
    val (nBuckets, builtDocMax, covered) = readMeta(spark, outDir)
    if (IndexBuilder.docIdHighWater(spark, outDir) <= builtDocMax) return
    val tailTerms = vocab(spark, outDir, Some(col("chunk") >= covered))
    val known = spark.read.parquet(triDir(outDir)).select("term").distinct()
    // materialize the delta to a tmp table BEFORE the append: the
    // delta pipeline reads the grid it is about to extend, and a lazy
    // read over a table a write job is mutating is the repo's
    // FAILED_READ_FILE trap (CLAUDE.md invariants)
    val tmp = triDir(outDir) + "_delta_tmp"
    tailTerms.join(known, Seq("term"), "left_anti")
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fresh = spark.read.parquet(tmp)
    if (fresh.head(1).nonEmpty)
      gridOf(fresh, nBuckets)
        .repartition(col("bucket"))
        .write.mode(SaveMode.Append).partitionBy("bucket")
        .parquet(triDir(outDir))
    IndexBuilder.deleteTree(spark, tmp)
    writeMeta(spark, outDir, nBuckets)
  }

  /** Terms matching a '*' wildcard pattern. Candidate generation probes
    * only the required trigrams' bucket partitions; verification is a
    * regex over candidates. A stale sidecar (index appended since
    * build/refresh) unions a regex scan of the uncovered tail chunks'
    * terms so new vocabulary cannot be silently missed.
    */
  def wildcardTerms(spark: SparkSession, outDir: String,
                    pattern: String): DataFrame = {
    val (nBuckets, builtDocMax, covered) = readMeta(spark, outDir)
    val rx = patternRegex(pattern)
    val required = requiredTrigrams(pattern)
    val side = spark.read.parquet(triDir(outDir))
    val cand =
      if (required.isEmpty) side.select("term").distinct()
      else {
        val buckets = required.map(bucketScalar(_, nBuckets)).distinct
        side.filter(col("bucket").isin(buckets: _*) &&
            col("tri").isin(required: _*))
          .groupBy(col("term")).agg(count(lit(1)).as("n"))
          .filter(col("n") === required.size)
          .select(col("term"))
      }
    val fromSidecar = cand.filter(col("term").rlike(rx))
    if (IndexBuilder.docIdHighWater(spark, outDir) <= builtDocMax) fromSidecar
    else fromSidecar.unionByName(
        vocab(spark, outDir, Some(col("chunk") >= covered))
          .filter(col("term").rlike(rx)))
      .distinct()
  }

  /** Wildcard term STATS straight off the index: tf/df per matched
    * term. The matched-term side is candidate-sized → broadcast into
    * the postings join; postings stay where they are.
    */
  def wildcardStats(spark: SparkSession, outDir: String,
                    pattern: String): DataFrame =
    IndexStore.readPostings(spark, outDir).toDF()
      .join(broadcast(wildcardTerms(spark, outDir, pattern)), Seq("term"))
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("tf"), sum(col("df")).as("df"))
}
