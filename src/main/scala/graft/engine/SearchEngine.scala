package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.codec.PostingCodec
import graft.config.GraftConfig
import graft.index.{BloomSidecar, DocRow, IndexBuilder, IndexStore, PostingRow}
import graft.query.{QueryParser, QOr}
import graft.rank.{ChunkContext, DocScore, RankDoc, RefRanker}

/** Builds the in-memory per-chunk ranking context from posting rows +
  * doc rows: reconstructs the reference's flat location space
  * (index/index.h:231-236; title+body tokens then the ##EndDoc slot per
  * doc) so the ISR/ranker port sees exactly the reference's geometry.
  */
object ChunkContextBuilder {
  def build(chunk: Long, posts: Seq[PostingRow], docRows: Seq[DocRow],
            chunkCapacity: Long): ChunkContext = {
    val docs = docRows.sortBy(_.docId).toArray
    val nDocs = docs.length
    val docBase = new Array[Long](nDocs)
    val endLocs = new Array[Long](nDocs)
    var base = 0L
    var i = 0
    while (i < nDocs) {
      docBase(i) = base
      endLocs(i) = base + docs(i).docLength + 1
      base = endLocs(i)
      i += 1
    }
    val localIdx = new java.util.HashMap[Long, Int](nDocs * 2)
    i = 0
    while (i < nDocs) { localIdx.put(docs(i).docId, i); i += 1 }

    val termLocs = Map.newBuilder[String, Array[Long]]
    val termTf = Map.newBuilder[String, Long]
    val termDf = Map.newBuilder[String, Long]
    posts.foreach { p =>
      val flat = new Array[Long](p.tf.toInt)
      var k = 0
      PostingCodec.decode(p.df, p.postingsBlob).foreach { case (docId, positions) =>
        val b = docBase(localIdx.get(docId))
        var j = 0
        while (j < positions.length) { flat(k) = b + positions(j); k += 1; j += 1 }
      }
      termLocs += p.term -> flat
      termTf += p.term -> p.tf
      termDf += p.term -> p.df
    }
    val totalTokens = docs.foldLeft(0L)(_ + _.docLength)
    new ChunkContext(chunk, termLocs.result(), termTf.result(), termDf.result(),
      endLocs,
      docs.map(d => RankDoc(d.docId, d.url, d.title, d.summary, d.numTitleWords, d.docLength)),
      totalPosts = totalTokens + nDocs,
      chunkCapacity = chunkCapacity)
  }
}

/** One ranked slot coming back from a chunk kernel. */
case class ChunkHit(chunk: Long, slot: Int, title: String, summary: String,
                    url: String, score: Long, docId: Long)

/** One scored candidate with its full component breakdown (the
  * DebugScore instrument, ranker/ranker.h:162-215) as returned by
  * [[SearchEngine.searchDebug]].
  */
case class DebugHit(chunk: Long, docId: Long, sStatic: Long, sUrl: Long,
                    sTitle: Long, sBodyRaw: Long, sBody: Long,
                    dynamicWeight: Long, total: Long)

/** Driver-side query API over a persisted index — the Spark re-expression
  * of indexServer.cpp + the front end fan-in (SURVEY.md §3.2): chunks are
  * ranked in parallel as one Dataset job (chunk ≙ index machine), the
  * tiny per-chunk top-K lists are collected, and the driver merges them in
  * ascending chunk order (≙ the reference's directory order).
  */
class SearchEngine(spark: SparkSession, indexDir: String,
                   chunkCapacity: Long = GraftConfig.ChunkDocs,
                   cache: Boolean = true,
                   broadcastDocsLimit: Long = 2000000L,
                   broadcastDocsBytes: Long = 256L << 20,
                   stagedChunkThreshold: Int = GraftConfig.StagedMergeChunks)
    extends Serializable {
  import spark.implicits._

  // cache() keeps hot chunks in executor memory across queries (the
  // mmap-resident HashFile analog, HashBlob.h:379-391); storage is
  // LRU-evicted so it degrades gracefully when the index outgrows memory.
  private val postings = {
    val p = IndexStore.readPostings(spark, indexDir)
    if (cache) p.cache() else p
  }
  private val docs = {
    val d = IndexStore.readDocs(spark, indexDir)
    if (cache) d.cache() else d
  }

  /** Doc-metadata sidecar, broadcast once per engine lifetime when it
    * fits (the reference keeps every chunk's DocumentData region
    * mmap-resident on its index server, HashBlob.h:364-377) — per-query
    * ranking then shuffles ONLY the query's posting rows. Indexes larger
    * than the limit fall back to a per-query cogroup against the docs
    * table.
    */
  /** Bloom chunk-skip sidecar present? (built opt-in via
    * graft.index.BloomSidecar.build — existence probed once per engine).
    */
  private lazy val bloomAvailable =
    IndexBuilder.pathExists(spark, BloomSidecar.metaDir(indexDir))

  private lazy val docsBroadcast: Option[org.apache.spark.broadcast.Broadcast[Map[Long, Array[DocRow]]]] = {
    // gate on estimated BYTES, not just rows (shared BroadcastGate, also
    // used by Bm25Engine's lens sidecar): a 2M-row sidecar of long
    // urls/titles/summaries would otherwise pull hundreds of MB through
    // the driver before the row gate noticed nothing was wrong. Strings
    // dominate; +64 covers the three longs + object headers per row.
    if (BroadcastGate.fits(docs.toDF(),
        length($"url") + length($"title") + length($"summary") +
          length($"contentSha") + lit(64L),
        broadcastDocsLimit, broadcastDocsBytes)) {
      val grouped = docs.collect().groupBy(_.chunk)
        .map { case (c, arr) => c -> arr.sortBy(_.docId) }
      Some(spark.sparkContext.broadcast(grouped))
    } else None
  }

  /** Rank-identical reference scoring (SURVEY.md §2.9). Returns the
    * combined top-K (empty slots dropped), ordered as the reference's
    * final result vector.
    */
  def search(query: String, topK: Int = GraftConfig.TopK): Seq[DocScore] = {
    val (astOpt, flat) = QueryParser.parseQuery(query)
    astOpt match {
      case None => Seq.empty
      case Some(ast) =>
        val hits = searchChunksPruned(ast, flat, topK)
        val merged = RefRanker.mergeChunkResults(
          hits.groupBy(_.chunk).view.mapValues { hs =>
            hs.sortBy(_.slot)
              .map(h => DocScore(h.title, h.summary, h.url, h.score, h.docId)).toArray
          }.toSeq, topK)
        merged.filter(_.url.nonEmpty).toSeq
    }
  }

  /** RESULTS_PER_PAGE slice of the final top-k — the front end's
    * pagination (config.h:26; webServer.cpp:737-757). page is 0-based.
    */
  def searchPage(query: String, page: Int, perPage: Int = 10): Seq[DocScore] =
    search(query).slice(page * perPage, (page + 1) * perPage)

  /** The distributed chunk kernel behind the STAGED cross-chunk merge
    * (the plan shape: filter postings to the query's terms via parquet
    * predicate pushdown, keep only chunks containing every flattened
    * word — the term-absent abort, ranker.h:718-720, also a major scale
    * win since rare terms prune almost all chunks — then cogroup the
    * pruned postings with the pruned docs metadata per chunk and run
    * the ranker kernel; ≤ topK rows per qualifying chunk): when more
    * than `stagedChunkThreshold` chunks qualify, the per-chunk slot rows
    * stay distributed; a census job finds the globally-duplicated urls /
    * (title, score) pairs (the only values the insertion fold's
    * order-dependent dedup rules can fire on), and each partition prunes
    * its provably side-effect-free clean rows executor-side
    * ([[RefRanker.pruneStream]] carries the exactness argument). The
    * driver then collects O(partitions·topK + dup-family) rows instead
    * of O(chunks·topK), and [[RefRanker.mergeChunkResults]] over the
    * kept rows is rank-identical to the full sequential fold
    * (StagedMergeSpec pins it on dup-collision fixtures and property
    * streams). Below the threshold — every bench/parity corpus — the
    * plain collect is both exact and cheaper than the census jobs.
    */
  private[graft] def searchChunksPruned(ast: QOr, flat: Vector[String],
                                        topK: Int): Seq[ChunkHit] = {
    searchChunksEither(ast, flat, topK) match {
      case Left(collected) => collected
      case Right((ds, nQualifying)) if nQualifying <= stagedChunkThreshold =>
        ds.collect().toSeq
      case Right((ds, _)) => SearchEngine.stagedPrune(spark, ds, topK)
    }
  }

  /** The chunk-kernel result WITHOUT forcing a collect: Left =
    * already-resolved rows (empty query / Bloom-empty / resident-sidecar
    * path), Right = the lazy per-chunk hit Dataset plus the
    * qualifying-chunk count. [[FederatedSearch]] uses this to union the
    * shards' hit sets for a GLOBAL census before the staged prune
    * (shard-local censuses cannot see cross-shard dup urls).
    */
  private[graft] def searchChunksEither(ast: QOr, flat: Vector[String],
                                        topK: Int)
      : Either[Seq[ChunkHit], (Dataset[ChunkHit], Int)] = {
    val k = topK
    kernelDataset[ChunkHit](flat) { ctx =>
      val chunk = ctx.chunk
      RefRanker.rankChunk(ast, flat, ctx, k).iterator.zipWithIndex.map {
        case (s, i) => ChunkHit(chunk, i, s.title, s.summary, s.url, s.score, s.docId)
      }
    }
  }

  /** Per-candidate DebugScore breakdown for a query (ranker.h:162-215;
    * tests/testQuery.cpp:47-61): every scored candidate in every
    * qualifying chunk, with its static/url/title/body components — the
    * rank-divergence diagnostic, distributed with the same plan shape as
    * search(). Ordered (chunk, docId).
    */
  def searchDebug(query: String): Seq[DebugHit] = {
    val (astOpt, flat) = QueryParser.parseQuery(query)
    astOpt match {
      case None => Seq.empty
      case Some(ast) =>
        runKernel(flat) { ctx =>
          val chunk = ctx.chunk
          RefRanker.debugScores(ast, flat, ctx).iterator.map { d =>
            DebugHit(chunk, d.docId, d.sStatic, d.sUrl, d.sTitle,
              d.sBodyRaw, d.sBody, d.dynamicWeight, d.total)
          }
        }.sortBy(h => (h.chunk, h.docId))
    }
  }

  /** Shared distributed chunk-kernel runner for the RefScore surfaces:
    * pushdown-pruned postings -> per-chunk ChunkContext -> `kernel`,
    * over whichever of the two plan shapes (resident doc sidecar vs
    * chunk-pruned cogroup) this index is using.
    */
  private def runKernel[T](flat: Vector[String])(kernel: ChunkContext => Iterator[T])
                          (implicit enc: org.apache.spark.sql.Encoder[T]): Seq[T] =
    kernelDataset(flat)(kernel) match {
      case Left(collected) => collected
      case Right((ds, _)) => ds.collect().toSeq
    }

  /** The kernel plan WITHOUT the final collect: Left = already-resolved
    * rows (empty query, Bloom-proven empty, or the resident-sidecar path
    * whose one-job collect is the plan); Right = the lazy cogroup
    * Dataset plus the qualifying-chunk count, for callers that want to
    * keep the rows distributed (the staged merge).
    */
  private def kernelDataset[T](flat: Vector[String])(kernel: ChunkContext => Iterator[T])
      (implicit enc: org.apache.spark.sql.Encoder[T])
      : Either[Seq[T], (Dataset[T], Int)] = {
    if (flat.isEmpty) return Left(Seq.empty)
    val distinctFlat = flat.distinct
    val needed = (distinctFlat ++ distinctFlat.map("#" + _)).distinct

    val posts = postings.filter($"term".isin(needed: _*))
    val cap = chunkCapacity

    docsBroadcast match {
      case Some(bc) =>
        // resident-sidecar path: ONE job — shuffle only the query's
        // posting rows; the kernel's term-absent abort (ranker.h:718-720)
        // disqualifies chunks without a separate pruning pass
        Left(posts.groupByKey(_.chunk)
          .flatMapGroups { (chunk, ps) =>
            bc.value.get(chunk) match {
              case None => Iterator.empty
              case Some(ds) =>
                kernel(ChunkContextBuilder.build(chunk, ps.toVector, ds, cap))
            }
          }
          .collect().toSeq)
      case None =>
        // big-index path: prune chunks first (the term-absent rule is
        // also a major scan saver: rare terms disqualify most chunks),
        // then cogroup only the qualifying docs metadata.
        // When the index carries a Bloom sidecar, consult it BEFORE the
        // posting scan: the candidate list prunes whole chunk
        // PARTITIONS (the sidecar job never touches postings), and its
        // no-false-negative contract keeps results bit-identical — an
        // empty candidate set proves no chunk holds every term.
        val bloomCand =
          if (bloomAvailable)
            BloomSidecar.candidateChunks(spark, indexDir, distinctFlat)
          else None
        if (bloomCand.exists(_.isEmpty)) return Left(Seq.empty)
        val postsB = bloomCand match {
          case Some(cs) => posts.filter($"chunk".isin(cs.toSeq: _*))
          case None => posts
        }
        val qualifying = postsB
          .filter($"term".isin(distinctFlat: _*))
          .groupBy($"chunk")
          .agg(countDistinct($"term").as("nt"))
          .filter($"nt" === distinctFlat.size)
          .select($"chunk").as[Long].collect().sorted
        if (qualifying.isEmpty) return Left(Seq.empty)
        val postsQ = postsB.filter($"chunk".isin(qualifying: _*))
        val docsQ = docs.filter($"chunk".isin(qualifying: _*))
        Right((postsQ.groupByKey(_.chunk)
          .cogroup(docsQ.groupByKey(_.chunk)) { (chunk, ps, ds) =>
            val postsSeq = ps.toVector
            val docsSeq = ds.toVector
            if (docsSeq.isEmpty) Iterator.empty
            else kernel(ChunkContextBuilder.build(chunk, postsSeq, docsSeq, cap))
          }, qualifying.length))
    }
  }
}

object SearchEngine {
  /** Census + executor-side prune of a distributed hit set — the staged
    * cross-chunk merge's distributed half, shared by
    * [[SearchEngine.searchChunksPruned]] (one index) and
    * [[FederatedSearch]] (the union of all shards' hit sets, remapped
    * into the global space first so the census sees cross-shard dups).
    * Exactness lives in [[graft.rank.RefRanker.pruneStream]]'s argument;
    * partitions may even split a chunk's slots (the proof only needs
    * each partition processed in (chunk, slot) order). Falls back to the
    * exact full collect when the positive-score precondition fails or a
    * dup-value census overflows the broadcast cap — both keep rank
    * identity, they just forgo the collect savings.
    */
  private[graft] def stagedPrune(spark: SparkSession, ds: Dataset[ChunkHit],
                                 topK: Int): Seq[ChunkHit] = {
    import spark.implicits._
    val hits = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var bu: org.apache.spark.broadcast.Broadcast[Set[String]] = null
    var bp: org.apache.spark.broadcast.Broadcast[Set[(String, Long)]] = null
    try {
      // empty slots (score 0, url "") are provable no-ops in the fold —
      // drop them before the census so they can't trip the guards
      val real = hits.filter(h => !(h.score == 0L && h.url.isEmpty))
      // pruneStream's exactness needs every candidate score > 0 AND
      // every candidate url non-empty (an empty url would dup-match the
      // fold array's empty padding slots while they last — a
      // state-dependent decision the prune may not make); either
      // violation ⇒ the exact full collect
      val g = real.agg(min(col("score")),
        sum(when(col("url") === "", 1L).otherwise(0L))).head()
      if (g.isNullAt(0)) return Seq.empty
      if (g.getLong(0) <= 0L || g.getLong(1) > 0L) return hits.collect().toSeq
      val cap = 100000
      val dupUrls = real.groupBy(col("url")).count().filter(col("count") > 1)
        .select(col("url")).as[String].head(cap + 1)
      if (dupUrls.length > cap) return hits.collect().toSeq
      val dupPairs = real.groupBy(col("title"), col("score")).count()
        .filter(col("count") > 1)
        .select(col("title"), col("score")).as[(String, Long)].head(cap + 1)
      if (dupPairs.length > cap) return hits.collect().toSeq
      bu = spark.sparkContext.broadcast(dupUrls.toSet)
      bp = spark.sparkContext.broadcast(dupPairs.toSet)
      val buv = bu; val bpv = bp // stable refs for the closure
      val k = topK
      real.mapPartitions { it =>
        val rows = it.map(h => (h.chunk, h.slot,
          DocScore(h.title, h.summary, h.url, h.score, h.docId))).toVector
        RefRanker.pruneStream(rows, buv.value, bpv.value, k).iterator.map {
          case (c, sl, d) =>
            ChunkHit(c, sl, d.title, d.summary, d.url, d.score, d.docId)
        }
      }.collect().toSeq
    } finally {
      // serving processes run one stagedPrune per cache miss — without
      // an explicit destroy the dead broadcast blocks only go away on a
      // driver GC, which a long-lived JVM may not run for hours
      if (bu != null) bu.destroy()
      if (bp != null) bp.destroy()
      hits.unpersist(); ()
    }
  }
}
