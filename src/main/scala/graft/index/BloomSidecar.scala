package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-chunk term Bloom filters — metadata-level chunk skipping for the
  * query engines.
  *
  * The engines' big-index path prunes chunks by SCANNING the postings
  * table with a term predicate (parquet pushdown): cheap per row, but at
  * 10^5+ chunk partitions every query still opens every partition's file
  * footers just to discover that a rare term touches three of them. The
  * reference engine has the same structural answer at a smaller scale —
  * its dictionary hash probe rejects absent terms before any posting
  * bytes are read (index/HashBlob.h:341-399). This sidecar is that probe
  * distilled per chunk: k portable hash bits per (chunk, term), OR-ed
  * into fixed-width bitmaps, stored as a table ~10^4x smaller than the
  * postings. A query consults the sidecar first (one small job that
  * never touches postings) and hands the engines an explicit candidate
  * chunk list, so the posting scan's `chunk isin (...)` prunes
  * partitions outright.
  *
  * No false negatives by construction (bits are set from the exact
  * (chunk, term) pairs of the postings table), so engine results are
  * bit-identical with or without the sidecar — false positives only
  * cost a wasted partition read. With m bits per chunk, v distinct
  * terms per chunk, and k hashes, the per-term FP rate is
  * ~(1 - e^(-kv/m))^k; the 2^19/4 defaults give < 1% at v = 30k.
  *
  * Word layout: 63 bits per word (bit index = pos mod 63). Bit 63 of a
  * signed 64-bit word is unusable portably — `1 << 63` overflows DuckDB
  * (and any ANSI engine that checks shifts), and the oracle replays
  * every word bit-for-bit.
  *
  * Hashing: the [[graft.analysis.Sketches.cmsCol]] family — the same
  * row-salted polynomial fold the CMS sketch uses (bounded integer
  * arithmetic, engine-portable). [[bitPosScalar]] is the driver-side
  * scalar twin, spec-pinned identical, used to derive probe masks
  * without a Spark job.
  */
object BloomSidecar {

  private val P = 2147483647L
  private val WordBits = 63

  /** m must keep pos arithmetic in the cmsCol bound and the word count
    * sane; 2^19 bits = ~10 KB/chunk at the default fill.
    */
  val DefaultBits = 1 << 19
  val DefaultHashes = 4

  def bloomDir(outDir: String) = s"$outDir/bloom"
  def metaDir(outDir: String) = s"$outDir/bloom_meta"

  /** Whether the index at `outDir` has a sidecar (maintenance flows use
    * this to keep a present sidecar fresh without creating one).
    */
  def exists(spark: SparkSession, outDir: String): Boolean =
    IndexBuilder.pathExists(spark, metaDir(outDir))

  /** Scalar twin of the Column-side position: hash j of `term` in
    * [0, mBits). Must stay identical to
    * `Sketches.cmsCol(term, lit(j), mBits)` (BloomSidecarSpec pins it).
    */
  def bitPosScalar(term: String, j: Long, mBits: Int): Long = {
    val f = term.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P)
    ((f + j * 131L) % P * 2654435761L % P + 1L) % mBits
  }

  /** The bits grid for a (chunk, term) pair set: k hash fan-out, OR-fold
    * per (chunk, word). Rows: (chunk, word, bits); words no term hashed
    * into are simply absent (all-zero). The grid is chunk-local
    * arithmetic, so the single groupBy((chunk, word)) is the only
    * exchange and its output is the sidecar's own (small) size.
    */
  private def grid(ct: DataFrame, mBits: Int, kHashes: Int): DataFrame =
    ct.select(col("chunk"),
        explode(sequence(lit(0L), lit(kHashes - 1L))).as("j"), col("term"))
      .select(col("chunk"),
        graft.analysis.Sketches.cmsCol(col("term"), col("j"), mBits).as("pos"))
      .select(col("chunk"), expr(s"pos div $WordBits").as("word"),
        expr(s"shiftleft(1L, cast(pos % $WordBits as int))").as("m"))
      .groupBy(col("chunk"), col("word"))
      .agg(expr("bit_or(m)").as("bits"))

  private def writeMeta(spark: SparkSession, outDir: String, mBits: Int,
                        kHashes: Int, builtDocMax: Long, coveredMaxChunk: Long): Unit =
    spark.createDataFrame(Seq((mBits, kHashes, builtDocMax, coveredMaxChunk)))
      .toDF("mBits", "kHashes", "builtDocMax", "coveredMaxChunk")
      .write.mode("overwrite").parquet(metaDir(outDir))

  /** Meta row as (mBits, kHashes, builtDocMax, coveredMaxChunk). A meta
    * written before staleness bookkeeping existed lacks the last two
    * columns — read it as (-1, 0): "freshness unknowable, every chunk
    * potentially stale", the maximally-conservative stance (candidates
    * then include all present chunks >= 0 until a rebuild).
    */
  private def readMeta(spark: SparkSession, outDir: String): (Int, Int, Long, Long) = {
    val df = spark.read.parquet(metaDir(outDir))
    val hasStaleness = df.columns.contains("builtDocMax")
    val m = df.head()
    if (hasStaleness)
      (m.getInt(m.fieldIndex("mBits")), m.getInt(m.fieldIndex("kHashes")),
       m.getLong(m.fieldIndex("builtDocMax")), m.getLong(m.fieldIndex("coveredMaxChunk")))
    else
      (m.getInt(m.fieldIndex("mBits")), m.getInt(m.fieldIndex("kHashes")), -1L, 0L)
  }

  /** Build (or rebuild) the sidecar for an index: one narrow pass over
    * the postings table's (chunk, term) pairs — already one row per
    * pair by layout — into the [[grid]].
    *
    * Staleness bookkeeping: the meta row records the index's lineage
    * docId high-water mark (`builtDocMax`; -1 when the index has no
    * lineage table) and the highest chunk the grid covers
    * (`coveredMaxChunk`, from the stats table). Index maintenance moves
    * docIds strictly upward (appendBuild requires newer docIds,
    * mergeIndexes shifts src above the dest high-water, compact never
    * reuses ids), so every chunk created or modified AFTER this build is
    * `>= coveredMaxChunk` — [[candidateChunks]] uses that to stay
    * false-negative-free against a stale sidecar, and [[refresh]] to
    * rebuild only the stale tail.
    */
  def build(spark: SparkSession, outDir: String,
            mBits: Int = DefaultBits, kHashes: Int = DefaultHashes): Unit = {
    require(mBits > WordBits && kHashes > 0, "mBits must be > 63, kHashes > 0")
    import spark.implicits._
    val ct = IndexStore.readPostings(spark, outDir).select(col("chunk"), col("term"))
    grid(ct, mBits, kHashes).write.mode("overwrite").parquet(bloomDir(outDir))
    val builtDocMax =
      if (IndexBuilder.pathExists(spark, IndexBuilder.lineageDir(outDir)))
        IndexBuilder.docIdHighWater(spark, outDir)
      else -1L
    val coveredMaxChunk = IndexStore.readStats(spark, outDir)
      .agg(max(col("chunk"))).as[Long].head()
    writeMeta(spark, outDir, mBits, kHashes, builtDocMax, coveredMaxChunk)
  }

  /** Delta-cost catch-up after index maintenance: rebuild grid rows for
    * the stale tail only (chunks >= the covered high-water — the one
    * boundary chunk appendBuild may have extended, plus everything
    * appended/merged after it), carry the fresh head over, and swap the
    * table in via the stats tmp-dir pattern (the new table reads the old
    * one, so an in-place overwrite would re-read partitions its own
    * commit just replaced). Work ∝ the stale chunks' postings, never the
    * full index. No-op when the sidecar is already fresh.
    */
  def refresh(spark: SparkSession, outDir: String): Unit = {
    require(IndexBuilder.pathExists(spark, metaDir(outDir)),
      s"refresh: no Bloom sidecar at $outDir (use build)")
    import spark.implicits._
    val (mBits, kHashes, builtDocMax, coveredMaxChunk) = readMeta(spark, outDir)
    if (builtDocMax < 0 ||
        !IndexBuilder.pathExists(spark, IndexBuilder.lineageDir(outDir))) {
      // freshness unknowable (pre-staleness meta or a lineage-less
      // index): a delta can't be bounded, rebuild from scratch
      build(spark, outDir, mBits, kHashes); return
    }
    val hw = IndexBuilder.docIdHighWater(spark, outDir)
    if (hw == builtDocMax) return
    val stale = col("chunk") >= coveredMaxChunk
    val ct = IndexStore.readPostings(spark, outDir).filter(stale)
      .select(col("chunk"), col("term"))
    val keep = spark.read.parquet(bloomDir(outDir)).filter(!stale)
    val tmp = bloomDir(outDir) + ".tmp"
    keep.unionByName(grid(ct, mBits, kHashes))
      .write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(bloomDir(outDir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexBuilder.deleteTree(spark, bloomDir(outDir))
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(bloomDir(outDir))),
      s"bloom swap rename failed for $outDir")
    val newCovered = IndexStore.readStats(spark, outDir)
      .agg(max(col("chunk"))).as[Long].head()
    writeMeta(spark, outDir, mBits, kHashes, hw,
      math.max(coveredMaxChunk, newCovered))
  }

  /** Candidate chunks that may contain ALL of `terms`: None when the
    * index has no sidecar (caller skips pruning), Some(sorted chunk ids)
    * otherwise — a SUPERSET of the truly-qualifying chunks (no false
    * negatives), possibly empty (then no chunk qualifies and the caller
    * can answer without touching postings at all).
    *
    * Plan: probe masks are computed driver-side with the scalar hash
    * (|terms| * k positions — no job), shipped as a broadcast literal
    * table, and checked with ONE scan of the sidecar: a chunk passes a
    * term iff every one of the term's (word, mask) rows finds its
    * sidecar word with all mask bits set (an absent word row is an
    * all-zero word — the inner join drops it and the count check
    * fails). Nothing corpus- or postings-sized moves.
    *
    * Staleness: when the index's lineage high-water mark has moved past
    * the sidecar's `builtDocMax` (an append/merge landed after the grid
    * was built) — or the mark is unknowable (no lineage at build or
    * query time) — every PRESENT chunk `>= coveredMaxChunk` is added to
    * the candidates unconditionally (one tiny stats read): maintenance
    * only creates/extends chunks at or above the covered boundary, so
    * the no-false-negative contract survives a stale sidecar; only the
    * pruning of the new tail is lost until [[refresh]] runs. The
    * freshness probe is one lineage-table read per call (a serving
    * layer that owns the maintenance schedule can refresh eagerly and
    * skip none of this — correctness never depends on it).
    */
  def candidateChunks(spark: SparkSession, outDir: String,
                      terms: Seq[String],
                      requireAll: Boolean = true): Option[Array[Long]] = {
    require(terms.nonEmpty, "terms must be non-empty")
    if (!IndexBuilder.pathExists(spark, metaDir(outDir))) return None
    import spark.implicits._
    val (mBits, kHashes, builtDocMax, coveredMaxChunk) = readMeta(spark, outDir)
    val fresh = builtDocMax >= 0 &&
      IndexBuilder.pathExists(spark, IndexBuilder.lineageDir(outDir)) &&
      IndexBuilder.docIdHighWater(spark, outDir) == builtDocMax
    val staleCands: Array[Long] =
      if (fresh) Array.empty
      else IndexStore.readStats(spark, outDir)
        .filter(col("chunk") >= coveredMaxChunk)
        .select(col("chunk")).as[Long].collect()
    val probeRows = terms.distinct.flatMap { t =>
      val byWord = (0L until kHashes.toLong)
        .map(j => bitPosScalar(t, j, mBits))
        .groupBy(_ / WordBits)
      byWord.toSeq.map { case (w, ps) =>
        (t, w, ps.map(p => 1L << (p % WordBits).toInt).reduce(_ | _), byWord.size)
      }
    }
    val probes = probeRows.toDF("term", "word", "mask", "nm")
    val needTerms = if (requireAll) terms.distinct.size.toLong else 1L
    val cand = spark.read.parquet(bloomDir(outDir))
      .join(broadcast(probes), "word")
      .filter((col("bits").bitwiseAND(col("mask"))) === col("mask"))
      .groupBy(col("chunk"), col("term"))
      .agg(count(lit(1)).as("got"), first(col("nm")).as("nm"))
      .filter(col("got") === col("nm"))
      .groupBy(col("chunk"))
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") >= needTerms)
      .select(col("chunk").cast("long")).as[Long]
      .collect()
    Some((cand ++ staleCands).distinct.sorted)
  }

  /** The sidecar as a DataFrame (oracle/diagnostic surface). */
  def read(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(bloomDir(outDir))
      .select(col("chunk").cast("long").as("chunk"), col("word"), col("bits"))
}
