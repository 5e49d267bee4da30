package graft.index

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.corpus.Corpus
import graft.tokenizer.Tokenizer

/** Index-build pipeline: tokenize -> per-(chunk, term) typed aggregation
  * -> compressed posting chunks + document store + per-chunk stats, with
  * per-partition lineage for resume (SURVEY.md §3.1, §7).
  *
  * The one unavoidable wide shuffle is tokenize -> groupBy(chunk, term);
  * everything downstream is chunk-partitioned and writes with dynamic
  * partition overwrite so a resumed build only rewrites incomplete chunks.
  */
object IndexBuilder {

  /** @param chunkDocs  docs per chunk (config.h:12; tests override)
    * @param salts      >1 enables the two-level salted aggregation for
    *                   high-df terms: stage 1 aggregates contiguous docId
    *                   range slices, stage 2 concatenates the sorted runs
    */
  case class BuildConfig(chunkDocs: Long = GraftConfig.ChunkDocs, salts: Int = 1)

  def chunkOf(docId: Long, chunkDocs: Long): Long = docId / chunkDocs

  /** Tokenize into the posting stream (title terms '#'-decorated, title
    * first, 1-based positions; index/index.h:122-176).
    */
  def tokens(docs: Dataset[IdDoc], cfg: BuildConfig): Dataset[Token] = {
    import docs.sparkSession.implicits._
    val chunkDocs = cfg.chunkDocs
    docs.flatMap { d =>
      val chunk = chunkOf(d.docId, chunkDocs)
      Tokenizer.postings(d.path, d.content).iterator.map {
        case (term, pos) => Token(chunk, term, d.docId, pos)
      }
    }
  }

  /** Build posting lists. salts == 1: single typed aggregation. salts > 1:
    * stage 1 groups by (chunk, term, salt) where salt is a contiguous
    * docId-range slice, stage 2 concatenates each term's runs in salt
    * order — bounded memory per task even for df ≈ chunk-size terms
    * (north rule's explicit skew handling; the reference's analog is the
    * hostname-hash crawl partitioning, crawler/hash_helper.hpp:12-20).
    */
  def buildPostings(toks: Dataset[Token], cfg: BuildConfig): Dataset[PostingRow] = {
    import toks.sparkSession.implicits._
    val agg = new PostingAggregator().toColumn
    if (cfg.salts <= 1) {
      toks.groupByKey(t => (t.chunk, t.term))
        .mapValues(t => (t.docId, t.pos))
        .agg(agg)
        .map { case ((chunk, term), p) =>
          PostingRow(chunk, term, p.df, p.tf, p.blocks, p.postingsBlob) }
    } else {
      val salts = cfg.salts
      val chunkDocs = cfg.chunkDocs
      toks.groupByKey { t =>
        val slice = ((t.docId % chunkDocs) * salts / chunkDocs).toInt
        (t.chunk, t.term, slice)
      }
        .mapValues(t => (t.docId, t.pos))
        .agg(agg)
        .map { case ((chunk, term, slice), p) => (chunk, term, slice, p) }
        .groupByKey { case (chunk, term, _, _) => (chunk, term) }
        .mapGroups { (key: (Long, String), it: Iterator[(Long, String, Int, PostingPayload)]) =>
          val (chunk, term) = key
          val runs = it.toArray.sortBy(_._3).map(_._4)
          val merged = new scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]
          runs.foreach { p =>
            graft.codec.PostingCodec.decode(p.df, p.postingsBlob)
              .foreach(merged += _)
          }
          val (df, tf, blocks, blob) = graft.codec.PostingCodec.encode(merged)
          PostingRow(chunk, term, df, tf, blocks, blob)
        }
    }
  }

  /** Document store (DocumentData analog, index/PostingList.h:25-31) with
    * the per-row sha256(content) invariant (input_hint).
    */
  def buildDocs(docs: Dataset[IdDoc], cfg: BuildConfig): Dataset[DocRow] = {
    import docs.sparkSession.implicits._
    val chunkDocs = cfg.chunkDocs
    docs.map { d =>
      val numTitle = Tokenizer.titleWordsRaw(d.path).length.toLong
      val docLength = Tokenizer.postings(d.path, d.content).length.toLong
      DocRow(
        chunk = chunkOf(d.docId, chunkDocs),
        docId = d.docId,
        url = Corpus.url(d.repo, d.path, d.commit),
        title = Tokenizer.titleString(d.path),
        summary = Tokenizer.abstractString(d.content),
        numTitleWords = numTitle,
        docLength = docLength,
        contentSha = Sha.hex256(if (d.content == null) "" else d.content))
    }
  }

  /** Per-chunk stats (HashBlob header analog). totalPosts = tokens +
    * numDocs because the reference counts the ##EndDoc list's one posting
    * per document in NumberOfPosts (index/HashBlob.h:303) and the ranker
    * divides by the *configured* chunk capacity, not the actual doc count
    * (ranker/ranker.h:802-804) — avgdl here uses chunkDocs accordingly.
    */
  def buildStats(docRows: Dataset[DocRow], postings: Dataset[PostingRow],
                 cfg: BuildConfig): Dataset[StatsRow] = {
    import docRows.sparkSession.implicits._
    val docAgg = docRows.groupBy($"chunk").agg(
      count(lit(1)).as("numDocs"),
      sum($"docLength").as("totalTokens"))
    val termAgg = postings.groupBy($"chunk")
      .agg(count(lit(1)).as("uniqueTerms"))
    docAgg.join(termAgg, Seq("chunk"), "left")
      .select($"chunk", $"numDocs", $"totalTokens",
        ($"totalTokens" + $"numDocs").as("totalPosts"),
        coalesce($"uniqueTerms", lit(0L)).as("uniqueTerms"),
        (($"totalTokens" + $"numDocs").cast("double") / lit(cfg.chunkDocs.toDouble)).as("avgdl"))
      .as[StatsRow]
  }

  // ---- persistence + lineage ----

  def postingsDir(out: String) = s"$out/postings"
  def docsDir(out: String) = s"$out/docs"
  def statsDir(out: String) = s"$out/stats"
  def lineageDir(out: String) = s"$out/lineage"

  /** Chunks already marked complete for `stage` in the lineage table. */
  def completedChunks(spark: SparkSession, outDir: String, stage: String): Set[Long] = {
    import spark.implicits._
    if (!new java.io.File(lineageDir(outDir)).exists()) return Set.empty
    try {
      spark.read.parquet(lineageDir(outDir))
        .filter($"stage" === stage && $"status" === "complete")
        .select($"chunk").distinct().as[Long].collect().toSet
    } catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }
  }

  /** Full build with resume: docs whose chunk is already complete (both
    * stages) are never re-tokenized; chunk-partitioned outputs are written
    * with dynamic partition overwrite so a re-run only touches the chunks
    * it rebuilt. Returns the set of chunks built in this invocation.
    */
  def build(spark: SparkSession, src: Dataset[IdDoc], outDir: String,
            cfg: BuildConfig = BuildConfig()): Set[Long] = {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val done = completedChunks(spark, outDir, "postings")
      .intersect(completedChunks(spark, outDir, "docs"))
    val chunkDocs = cfg.chunkDocs
    val pending = if (done.isEmpty) src else {
      val doneB = spark.sparkContext.broadcast(done)
      src.filter(d => !doneB.value.contains(chunkOf(d.docId, chunkDocs)))
    }
    if (pending.isEmpty) return Set.empty

    val toks = tokens(pending, cfg)
    val postings = buildPostings(toks, cfg)
    val docRows = buildDocs(pending, cfg)

    docRows.write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(docsDir(outDir))
    postings.write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(postingsDir(outDir))

    // stats + lineage are derived from what was just written (small reads)
    buildStats(IndexStore.readDocs(spark, outDir),
               IndexStore.readPostings(spark, outDir), cfg)
      .write.mode(SaveMode.Overwrite).parquet(statsDir(outDir))

    val builtChunks = docRows.select($"chunk").distinct().as[Long].collect().toSet

    val postingLineage = postings.groupBy($"chunk").agg(
      min($"term").as("termMin"), max($"term").as("termMax"),
      min(element_at($"blocks", 1).getField("firstDocId")).as("docMin"),
      max(element_at($"blocks", -1).getField("lastDocId")).as("docMax"),
      count(lit(1)).as("rows"), sum(length($"postingsBlob")).as("bytes"))
      .select(lit("postings").as("stage"), $"chunk", $"termMin", $"termMax",
        $"docMin", $"docMax", $"rows", $"bytes", lit("complete").as("status"))
    val docLineage = docRows.groupBy($"chunk").agg(
      min($"docId").as("docMin"), max($"docId").as("docMax"),
      count(lit(1)).as("rows"), sum($"docLength").as("bytes"))
      .select(lit("docs").as("stage"), $"chunk", lit("").as("termMin"),
        lit("").as("termMax"), $"docMin", $"docMax", $"rows", $"bytes",
        lit("complete").as("status"))
    postingLineage.unionByName(docLineage).as[LineageRow]
      .write.mode(SaveMode.Append).parquet(lineageDir(outDir))

    builtChunks
  }
}

/** sha256 hex via the JDK (no extra deps). */
object Sha {
  def hex256(s: String): String = hex256Bytes(s.getBytes("UTF-8"))

  def hex256Bytes(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xFF}%02x"))
    sb.toString
  }
}

/** Typed readers over a persisted index. `chunk` is a partition directory
  * column, so its inferred type is normalized back to long explicitly.
  */
object IndexStore {
  import org.apache.spark.sql.functions.col

  def readPostings(spark: SparkSession, outDir: String): Dataset[PostingRow] = {
    import spark.implicits._
    spark.read.parquet(IndexBuilder.postingsDir(outDir))
      .withColumn("chunk", col("chunk").cast("long"))
      .select("chunk", "term", "df", "tf", "blocks", "postingsBlob")
      .as[PostingRow]
  }

  def readDocs(spark: SparkSession, outDir: String): Dataset[DocRow] = {
    import spark.implicits._
    spark.read.parquet(IndexBuilder.docsDir(outDir))
      .withColumn("chunk", col("chunk").cast("long"))
      .select("chunk", "docId", "url", "title", "summary", "numTitleWords",
        "docLength", "contentSha")
      .as[DocRow]
  }

  def readStats(spark: SparkSession, outDir: String): Dataset[StatsRow] = {
    import spark.implicits._
    spark.read.parquet(IndexBuilder.statsDir(outDir)).as[StatsRow]
  }
}
