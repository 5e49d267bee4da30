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

  /** Scalar twin of the Column-side position: hash j of `term` in
    * [0, mBits). Must stay identical to
    * `Sketches.cmsCol(term, lit(j), mBits)` (BloomSidecarSpec pins it).
    */
  def bitPosScalar(term: String, j: Long, mBits: Int): Long = {
    val f = term.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P)
    ((f + j * 131L) % P * 2654435761L % P + 1L) % mBits
  }

  /** Build (or rebuild) the sidecar for an index: one narrow pass over
    * the postings table's (chunk, term) pairs — already one row per
    * pair by layout — fanned out k ways and OR-folded per (chunk, word).
    * Output rows: (chunk, word, bits); words no term hashed into are
    * simply absent (all-zero). The grid is chunk-partition-local
    * arithmetic, so the single groupBy((chunk, word)) is the only
    * exchange and its output is the sidecar's own (small) size.
    */
  def build(spark: SparkSession, outDir: String,
            mBits: Int = DefaultBits, kHashes: Int = DefaultHashes): Unit = {
    require(mBits > WordBits && kHashes > 0, "mBits must be > 63, kHashes > 0")
    val ct = IndexStore.readPostings(spark, outDir).select(col("chunk"), col("term"))
    val cells = ct
      .select(col("chunk"),
        explode(sequence(lit(0L), lit(kHashes - 1L))).as("j"), col("term"))
      .select(col("chunk"),
        graft.analysis.Sketches.cmsCol(col("term"), col("j"), mBits).as("pos"))
      .select(col("chunk"), expr(s"pos div $WordBits").as("word"),
        expr(s"shiftleft(1L, cast(pos % $WordBits as int))").as("m"))
      .groupBy(col("chunk"), col("word"))
      .agg(expr("bit_or(m)").as("bits"))
    cells.write.mode("overwrite").parquet(bloomDir(outDir))
    spark.createDataFrame(Seq((mBits, kHashes)))
      .toDF("mBits", "kHashes")
      .write.mode("overwrite").parquet(metaDir(outDir))
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
    */
  def candidateChunks(spark: SparkSession, outDir: String,
                      terms: Seq[String],
                      requireAll: Boolean = true): Option[Array[Long]] = {
    require(terms.nonEmpty, "terms must be non-empty")
    if (!IndexBuilder.pathExists(spark, metaDir(outDir))) return None
    import spark.implicits._
    val meta = spark.read.parquet(metaDir(outDir)).head()
    val (mBits, kHashes) = (meta.getInt(0), meta.getInt(1))
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
      .collect().sorted
    Some(cand)
  }

  /** The sidecar as a DataFrame (oracle/diagnostic surface). */
  def read(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(bloomDir(outDir))
      .select(col("chunk").cast("long").as("chunk"), col("word"), col("bits"))
}
