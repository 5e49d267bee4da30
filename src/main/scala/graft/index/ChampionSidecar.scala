package graft.index

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted champion-list sidecar — static index pruning (IIR §7.1.3 /
  * the impact-ordered-index family) made a BUILD-TIME artifact instead
  * of a per-query recompute: the per-(chunk, term) top-`m` champion
  * prefixes by (tf desc, docId asc) are materialized once, so the
  * champion query's stage 1 reads m-row prefixes instead of decoding
  * every qualifying posting blob (the stopword-heavy-query cost driver
  * the operator exists for). The reference engine has no champion path
  * (it always ranks every candidate, ranker.h:756-765); this is the
  * classic quality/latency trade a production engine adds, built
  * Spark-first like the Bloom / Trigram sidecars it sits beside.
  *
  * Layout: rows (term, doc_id, tf, rank) partitioned by
  * (chunk, bucket) where bucket is the portable term-hash route (same
  * grid hash as the Trigram sidecar). Probes prune on bucket
  * (PartitionFilters — ChampionSidecarSpec asserts it) and push the
  * term filter into the scan; maintenance rewrites whole chunk
  * directories (top-level partitions). `nBuckets` tunes file
  * granularity: dirs = chunks × nBuckets.
  *
  * Staleness contract (the sidecar must stay ROW-IDENTICAL to a fresh
  * recompute for every covered chunk — the champion operator is
  * approximate vs full BM25 but deterministic vs the index, and
  * q_bm25_champion pins that determinism):
  *  - APPEND / MERGE only add docs past the high-water, touching only
  *    chunks >= coveredMaxChunk (the boundary chunk can GROW, so it
  *    counts as stale — the Trigram rule). A stale probe recomputes the
  *    tail chunks inline (work ∝ delta); [[refresh]] folds the same
  *    tail into the store.
  *  - markDeleted leaves postings untouched — champions unchanged.
  *  - COMPACT rewrites covered chunks in place, which no high-water
  *    check can see. [[onCompact]] (called by IndexBuilder.compact)
  *    repairs exactly the affected chunks, and deletes the META FIRST:
  *    if the repair dies mid-way the sidecar reads as absent and every
  *    query falls back to the exact inline recompute — stale-wrong
  *    answers are structurally impossible, the failure mode is only
  *    lost acceleration.
  *  - A request for m' > the built m falls back to inline recompute
  *    (prefixes only shrink exactly: top-m' is a prefix of top-m for
  *    m' <= m under the frozen (tf desc, docId asc) order).
  */
object ChampionSidecar {

  def champDir(outDir: String) = s"$outDir/champion"
  def champMetaDir(outDir: String) = s"$outDir/champion_meta"

  def exists(spark: SparkSession, outDir: String): Boolean =
    IndexBuilder.pathExists(spark, champMetaDir(outDir))

  /** Bucket route of a term (scalar twin of the column-side hash —
    * same portable grid hash the Trigram sidecar routes with).
    */
  def bucketScalar(term: String, nBuckets: Int): Long =
    BloomSidecar.bitPosScalar(term, 0L, nBuckets)

  /** Champion rows for the chunks matching `chunkPred` (None = all):
    * per (chunk, term) the top-`m` (doc_id, tf) by (tf desc, doc_id
    * asc) with 1-based rank. One pass over the (possibly
    * partition-pruned) posting rows; the per-row decode is the same
    * kernel the inline champion stage 1 runs. Title terms ('#'-prefixed)
    * are excluded — champion queries go through the tokenizer's body
    * vocabulary.
    */
  def championRows(spark: SparkSession, outDir: String,
                   chunkPred: Option[Column], m: Int,
                   nBuckets: Int,
                   terms: Option[Seq[String]] = None): DataFrame = {
    import spark.implicits._
    val posts = IndexStore.readPostings(spark, outDir).toDF()
    val pruned = terms.fold(chunkPred.fold(posts)(p => posts.filter(p))) { ts =>
      // probe-time tail recompute: the term filter must reach the scan
      // (PushedFilters) so only the QUERY terms' tail blobs decode
      chunkPred.fold(posts)(p => posts.filter(p))
        .filter(col("term").isin(ts: _*))
    }
      .filter(!col("term").startsWith("#"))
    val mm = m
    pruned.select(col("chunk"), col("term"), col("df"), col("postingsBlob"))
      .as[(Long, String, Long, Array[Byte])]
      .flatMap { case (chunk, term, df, blob) =>
        graft.codec.PostingCodec.decode(df, blob).iterator
          .map { case (docId, poss) => (docId, poss.length.toLong) }
          .toArray
          .sortBy { case (id, tf) => (-tf, id) }
          .take(mm).iterator.zipWithIndex
          .map { case ((id, tf), i) =>
            (chunk, term, id, tf, (i + 1).toLong)
          }
      }
      .toDF("chunk", "term", "doc_id", "tf", "rank")
      .withColumn("bucket",
        graft.analysis.Sketches.cmsCol(col("term"), lit(0L), nBuckets)
          .cast("int"))
  }

  /** Highest chunk in the stats table; -1 when the index was compacted
    * down to nothing (covered = -1 makes every probe treat the whole
    * index as uncovered tail — trivially correct on an empty index).
    */
  private def coveredMaxChunk(spark: SparkSession, outDir: String): Long = {
    val r = IndexStore.readStats(spark, outDir)
      .agg(org.apache.spark.sql.functions.max(col("chunk"))).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  private def writeMeta(spark: SparkSession, outDir: String,
                        nBuckets: Int, m: Int): Unit =
    writeMetaAt(spark, outDir, nBuckets, m,
      IndexBuilder.docIdHighWater(spark, outDir),
      coveredMaxChunk(spark, outDir))

  private def writeMetaAt(spark: SparkSession, outDir: String,
                          nBuckets: Int, m: Int,
                          builtDocMax: Long, covered: Long): Unit =
    spark.createDataFrame(Seq((nBuckets, m, builtDocMax, covered)))
      .toDF("nBuckets", "m", "builtDocMax", "coveredMaxChunk")
      .write.mode(SaveMode.Overwrite).parquet(champMetaDir(outDir))

  /** (nBuckets, m, builtDocMax, coveredMaxChunk). */
  private[graft] def readMeta(spark: SparkSession,
                              outDir: String): (Int, Int, Long, Long) = {
    val r = spark.read.parquet(champMetaDir(outDir)).head()
    (r.getAs[Int]("nBuckets"), r.getAs[Int]("m"),
      r.getAs[Long]("builtDocMax"), r.getAs[Long]("coveredMaxChunk"))
  }

  /** Build the sidecar over the whole index. Rebuilding over an EXISTING
    * sidecar (the re-tune case: different m / nBuckets) follows the same
    * META-FIRST discipline as [[onCompact]]: the old meta is deleted
    * before the data overwrite starts, so at no point can old meta (old
    * m / nBuckets / watermarks) pair with partial or differently-
    * bucketed data — probes fall back to the exact inline path for the
    * duration, and a crash mid-rebuild leaves the sidecar disabled, not
    * lying (the file's failure-mode contract).
    */
  def build(spark: SparkSession, outDir: String, m: Int = 64,
            nBuckets: Int = 32): Unit = {
    require(m > 0 && nBuckets > 0, s"need positive m/nBuckets: $m/$nBuckets")
    if (exists(spark, outDir))
      IndexBuilder.deleteTree(spark, champMetaDir(outDir)) // disable first
    championRows(spark, outDir, None, m, nBuckets)
      .repartition(col("chunk"), col("bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("chunk", "bucket")
      .parquet(champDir(outDir))
    writeMeta(spark, outDir, nBuckets, m)
  }

  /** Fold appended tail chunks into the store — work ∝ delta. The
    * boundary chunk's rows are REPLACED (append can grow it); chunk
    * dirs are deleted before the append, and meta lands last, so a
    * mid-refresh crash leaves the tail merely stale (covered by the
    * high-water check at probe time), never wrong.
    */
  def refresh(spark: SparkSession, outDir: String): Unit = {
    val (nBuckets, m, builtDocMax, covered) = readMeta(spark, outDir)
    if (IndexBuilder.docIdHighWater(spark, outDir) <= builtDocMax) return
    val tail = championRows(spark, outDir,
      Some(col("chunk") >= covered), m, nBuckets)
    // materialize tail rows BEFORE deleting the dirs they replace: the
    // pipeline reads postings (not the champion store), but collecting
    // the chunk list here also tells us which dirs to drop
    val tailChunks = (covered to coveredMaxChunk(spark, outDir))
    tailChunks.foreach { c =>
      IndexBuilder.deleteTree(spark, s"${champDir(outDir)}/chunk=$c")
    }
    tail.repartition(col("chunk"), col("bucket"))
      .write.mode(SaveMode.Append).partitionBy("chunk", "bucket")
      .parquet(champDir(outDir))
    writeMeta(spark, outDir, nBuckets, m)
  }

  /** Repair after a compact rewrote `affected` chunks and removed
    * `emptied` ones. META-FIRST: the sidecar is disabled before any
    * data is touched and re-enabled only after the repair commits, so a
    * partial repair can never serve stale-wrong champion prefixes —
    * queries just take the exact inline path until a rebuild. No-op
    * when no sidecar exists.
    */
  def onCompact(spark: SparkSession, outDir: String,
                affected: Set[Long], emptied: Set[Long]): Unit = {
    if (!exists(spark, outDir)) return
    val (nBuckets, m, builtDocMax, covered) = readMeta(spark, outDir)
    IndexBuilder.deleteTree(spark, champMetaDir(outDir)) // disable
    (affected ++ emptied).foreach { c =>
      IndexBuilder.deleteTree(spark, s"${champDir(outDir)}/chunk=$c")
    }
    val survivors = affected -- emptied
    if (survivors.nonEmpty)
      championRows(spark, outDir,
          Some(col("chunk").isin(survivors.toSeq: _*)), m, nBuckets)
        .repartition(col("chunk"), col("bucket"))
        .write.mode(SaveMode.Append).partitionBy("chunk", "bucket")
        .parquet(champDir(outDir))
    // re-enable with the OLD coverage watermarks: compact repairs only
    // what it rewrote — if an un-refreshed appended tail existed before
    // the compact, stamping the current high-water here would ERASE the
    // staleness signal and serve the pre-append boundary-chunk prefixes
    // as fresh (ChampionSidecarSpec pins the append→compact-no-refresh
    // sequence). Rebuilt rows for chunks >= covered are simply ignored
    // by stale probes until a refresh folds the tail in properly.
    writeMetaAt(spark, outDir, nBuckets, m, builtDocMax, covered)
  }

  /** The candidate frame for a champion probe: sidecar prefixes for
    * the query's terms (bucket partition-pruned + term-pushed), rank
    * limited to the requested m', with the stale tail — if the index
    * high-water moved past the built one — recomputed inline from the
    * tail chunks' postings (chunk >= coveredMaxChunk; >= because the
    * boundary chunk counts as stale). Returns None when the sidecar
    * cannot answer exactly (requested m' exceeds the built m).
    * Output: (term, doc_id, tf).
    */
  def candidateFrame(spark: SparkSession, outDir: String,
                     terms: Seq[String], m: Int): Option[DataFrame] =
    candidateFrameWithMeta(spark, outDir, terms, m, readMeta(spark, outDir))

  /** [[candidateFrame]] with the meta tuple supplied by the caller —
    * Bm25Engine memoizes it per engine lifetime (the sidecar geometry
    * is immutable between maintenance ops, and maintenance implies a
    * fresh engine — the serving layer's reload contract), so the hot
    * path pays no per-query meta read. The docId high-water STALENESS
    * probe stays per-query: appends must be visible without an engine
    * rebuild.
    */
  private[graft] def candidateFrameWithMeta(spark: SparkSession, outDir: String,
                                            terms: Seq[String], m: Int,
                                            meta: (Int, Int, Long, Long))
      : Option[DataFrame] = {
    val (nBuckets, builtM, builtDocMax, covered) = meta
    if (m > builtM) return None
    val buckets = terms.map(t => bucketScalar(t, nBuckets).toInt).distinct
    // a sidecar built over an EMPTY index (or compacted down to nothing)
    // has meta but no parquet data files under champDir — the read
    // throws (no path / cannot infer schema) rather than yielding an
    // empty frame, so treat it as "cannot answer" and fall back inline,
    // consistent with the missing-meta behavior
    val side =
      try spark.read.parquet(champDir(outDir))
        .filter(col("bucket").isin(buckets: _*) &&
          col("term").isin(terms: _*) && col("rank") <= m)
        .select(col("chunk"), col("term"), col("doc_id"), col("tf"))
      catch {
        case _: org.apache.spark.sql.AnalysisException => return None
      }
    val stale = IndexBuilder.docIdHighWater(spark, outDir) > builtDocMax
    val all =
      if (!stale) side
      else side.filter(col("chunk") < covered).unionByName(
        championRows(spark, outDir, Some(col("chunk") >= covered), m, nBuckets,
            terms = Some(terms))
          .select(col("chunk"), col("term"), col("doc_id"), col("tf")))
    Some(all)
  }

  /** Global champion candidate docIds for the query terms: the
    * per-term global top-m over the per-chunk prefixes, selected
    * DISTRIBUTED (a window rank per term — the driver collects at most
    * |terms|·m ids, never the chunk-by-term union the inline stage 1
    * collects). Exactly the inline selection order (tf desc, doc_id
    * asc). None ⇒ caller must recompute inline.
    */
  def candidateIds(spark: SparkSession, outDir: String,
                   terms: Seq[String], m: Int): Option[Array[Long]] =
    candidateIdsWithMeta(spark, outDir, terms, m, readMeta(spark, outDir))

  /** [[candidateIds]] over caller-memoized meta (see
    * [[candidateFrameWithMeta]]).
    */
  private[graft] def candidateIdsWithMeta(spark: SparkSession, outDir: String,
                                          terms: Seq[String], m: Int,
                                          meta: (Int, Int, Long, Long))
      : Option[Array[Long]] =
    candidateFrameWithMeta(spark, outDir, terms, m, meta).map { cands =>
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      cands.withColumn("grank", row_number().over(
          Window.partitionBy(col("term"))
            .orderBy(desc("tf"), asc("doc_id"))))
        .filter(col("grank") <= m)
        .select(col("doc_id")).distinct()
        .as[Long].collect().sorted
    }
}
