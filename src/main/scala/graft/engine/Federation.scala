package graft.engine

import org.apache.spark.sql.SparkSession
import graft.config.GraftConfig
import graft.index.IndexBuilder
import graft.rank.Bm25
import graft.tokenizer.Tokenizer

/** Scatter-gather BM25 over K independently-built shard indexes — the
  * reference's actual serving topology (frontEnd/communicationServer.h:
  * 118-130 DistributeMessage fans one query out to 8 per-machine index
  * servers and merges their answers; configs/config.h:5 keeps those 8
  * indexes forever separate) re-expressed as a query-time operator with
  * one crucial upgrade: the reference lets each server rank against its
  * LOCAL statistics, so the same document scores differently depending
  * on which machine indexed it. Here the classic distributed-IR
  * df-exchange runs first — global N, total token count, and per-term
  * document frequencies are folded across shards (each a tiny pushed
  * parquet aggregate, memoized per shard engine) — and every shard then
  * scores through [[Bm25Engine.searchTermsWithStats]] against the same
  * GLOBAL stats. The federated ranking is therefore exactly the ranking
  * a single consolidated index would produce.
  *
  * DocId spaces: shards are built independently, so their docId spaces
  * collide. Results are reported in the GLOBAL space defined by the
  * [[graft.index.IndexBuilder.mergeIndexes]] fold rule — shard 0 keeps
  * its ids; shard i is shifted to the first chunk boundary strictly past
  * the federated high-water of shards 0..i-1. A federated view over
  * (s0, s1, ..., sk) is thus docId- AND score-identical to the one index
  * `mergeIndexes` would produce by folding s1..sk into s0 left-to-right
  * (FederationSpec pins this end-to-end), which makes federation the
  * zero-cost query path while a background consolidation merge is
  * pending — and the permanent path when shards must stay separate
  * (per-tenant / per-language / per-region placement).
  *
  * Scale shape: the scatter submits the per-shard jobs CONCURRENTLY
  * ([[Federation.scatter]] — the per-shard jobs are the same
  * chunk-pruned kernels the single-index engine runs: Bloom sidecars,
  * WAND, broadcast lens gates all apply per shard, and results come
  * back in shard order); the gather merges K sorted top-k lists (≤ K·k rows on the
  * driver, never data-sized). Global top-k ⊆ union of per-shard top-k
  * because every global winner is a fortiori in its own shard's top-k
  * under identical stats.
  */
class FederatedBm25(spark: SparkSession, shards: Seq[String]) {
  require(shards.nonEmpty, "FederatedBm25: need at least one shard index")

  private val engines: Seq[Bm25Engine] =
    shards.map(d => new Bm25Engine(spark, d))

  /** Per-shard chunk geometries. Mixed fleets are ALLOWED for BM25/QL
    * federation: scoring uses global statistics and each shard prunes
    * chunks in its own geometry, so the only shared contract is a
    * disjoint global docId space — which [[Federation.shardOffsetsMixed]]
    * provides by aligning every shard's offset to its OWN chunk size.
    * (RefScore federation accepts mixed fleets too — see
    * [[FederatedSearch]]'s geometry notes.)
    */
  private val geometries: Seq[Long] = {
    val gs = engines.map(_.chunkGeometry)
    require(gs.forall(_ > 0),
      s"federation: every shard needs persisted chunkDocs stats (got $gs)")
    gs
  }

  /** Per-shard docId offsets under the (geometry-aware) mergeIndexes
    * fold rule — see [[Federation.shardOffsetsMixed]].
    */
  val offsets: Seq[Long] =
    Federation.shardOffsetsMixed(spark, shards, geometries)

  /** Global (N, avgdl): raw sums folded across shards, never a mean of
    * per-shard means.
    */
  lazy val corpusStats: (Long, Double) = {
    val nts = Federation.scatter(engines.map(e => () => e.statsNT))
    val n = nts.map(_._1).sum
    (n, nts.map(_._2).sum.toDouble / math.max(n, 1L).toDouble)
  }

  /** The df-exchange: per-term document frequency summed across shards
    * (each shard's probe is a pushed parquet aggregate, memoized in that
    * shard's engine so repeat queries pay nothing). Zero-df terms drop.
    */
  def globalDf(terms: Seq[String]): Map[String, Long] =
    Federation.scatter(engines.map(e => () => e.shardDf(terms).toSeq))
      .flatten
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      .filter(_._2 > 0L)

  /** Federated top-k (global docIds), deterministic (score desc, global
    * docId asc) — identical to a consolidated index's ranking.
    */
  def searchTerms(terms: Seq[String], k: Int,
                  mode: Bm25Engine.Mode = Bm25Engine.Or,
                  useWand: Boolean = true): Seq[Bm25.Hit] = {
    val (n, avgdl) = corpusStats
    val dfMap = globalDf(terms)
    if (mode == Bm25Engine.And && terms.exists(t => !dfMap.contains(t)))
      return Seq.empty
    if (dfMap.isEmpty) return Seq.empty
    val idfMap = dfMap.map { case (t, df) => t -> Bm25.idf(n, df) }
    val merged = Federation.scatter(engines.zip(offsets).map {
      case (e, off) => () =>
        e.searchTermsWithStats(terms, k, idfMap, avgdl, mode, useWand)
          .map(h => h.copy(docId = h.docId + off))
    }).flatten
    merged.sorted(Bm25.better.reverse).take(k).toSeq
  }

  /** Federated Dirichlet query-likelihood: QL's global statistics are
    * the collection LM, so the exchange here folds per-term collection
    * frequencies AND token totals across shards — every shard then
    * smooths against the same background p(t|C) and the federated
    * ranking equals the consolidated index's
    * ([[Bm25Engine.searchTermsQl]] semantics; OOV terms drop).
    */
  def searchTermsQl(terms: Seq[String], k: Int,
                    mu: Double = 300.0): Seq[Bm25.Hit] = {
    val base = terms.distinct
    val (n, _) = corpusStats
    if (base.isEmpty || n == 0L) return Seq.empty
    val totalC = Federation.scatter(engines.map(e => () => e.statsNT))
      .map(_._2).sum
    val cf = Federation.scatter(engines.map(e => () => e.shardCf(base).toSeq))
      .flatten
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      .filter(_._2 > 0L)
    if (cf.isEmpty || totalC == 0L) return Seq.empty
    val kept = base.filter(cf.contains)
    val pcMap = kept.map(t => t -> cf(t).toDouble / totalC.toDouble).toMap
    val merged = Federation.scatter(engines.zip(offsets).map {
      case (e, off) => () =>
        e.searchTermsQlWithStats(kept, k, pcMap, mu)
          .map(h => h.copy(docId = h.docId + off))
    }).flatten
    merged.sorted(Bm25.better.reverse).take(k).toSeq
  }

  /** Tokenize with the frozen rules, scatter-gather, then resolve each
    * hit's url/title from its OWNING shard's docs table (chunk-pruned,
    * ≤ k rows per shard).
    */
  def search(query: String, k: Int = GraftConfig.TopK,
             mode: Bm25Engine.Mode = Bm25Engine.Or,
             useWand: Boolean = true): Seq[Bm25Hit] = {
    val terms = Tokenizer.bodyTokens(query).distinct.toSeq
    if (terms.isEmpty) return Seq.empty
    val hits = searchTerms(terms, k, mode, useWand)
    if (hits.isEmpty) return Seq.empty
    // group global ids by owning shard (the LAST shard whose offset is
    // <= id — offsets ascend), resolve locally, re-map to global
    val byShard = hits.groupBy(h => ownerOf(h.docId)).toSeq
    val meta: Map[Long, (String, String)] =
      Federation.scatter(byShard.map { case (i, hs) => () =>
        val local = hs.map(_.docId - offsets(i))
        engines(i).resolveMeta(local).map { case (id, ut) =>
          (id + offsets(i)) -> ut
        }
      }).flatten.toMap
    hits.map(h => Bm25Hit(h.docId, h.score,
      meta.get(h.docId).map(_._1).getOrElse(""),
      meta.get(h.docId).map(_._2).getOrElse("")))
  }

  /** Index of the shard owning a global docId (offsets ascend; the owner
    * is the last shard whose offset is <= the id).
    */
  private[engine] def ownerOf(globalId: Long): Int = {
    val i = offsets.lastIndexWhere(_ <= globalId)
    math.max(i, 0)
  }
}

object Federation {
  /** Scatter pool size: sized to the host (min(cores, 32), floor 8 —
    * the reference's own shard fan-out width, configs/config.h:5's 8
    * index servers) so a wide-K fleet on a big driver is not throttled
    * to 8 lanes; overridable via -Dgraft.fed.scatter.threads for
    * serving deployments that know their K.
    */
  private[graft] val scatterThreads: Int =
    sys.props.get("graft.fed.scatter.threads").map(_.toInt).getOrElse(
      math.max(8, math.min(Runtime.getRuntime.availableProcessors(), 32)))

  /** Per-scatter await bound in seconds (-Dgraft.fed.scatter.timeout.sec;
    * <= 0 = unbounded, the default): a hung shard job then fails the
    * federated call loudly instead of parking the serving thread forever.
    */
  private def scatterTimeout: scala.concurrent.duration.Duration = {
    import scala.concurrent.duration._
    sys.props.get("graft.fed.scatter.timeout.sec").map(_.toLong) match {
      case Some(s) if s > 0L => s.seconds
      case _ => Duration.Inf
    }
  }

  private val ScatterThreadName = "graft-fed-scatter"

  /** Bounded daemon pool for the federated scatter: per-shard Spark jobs
    * submit CONCURRENTLY (SparkContext schedules jobs from multiple
    * threads fine) instead of serializing on the driver loop — at the
    * reference's K=8 the sequential loop was tolerable, at large K it
    * became the gather's wall-clock. Results come back positionally
    * (Future.sequence preserves order), so every fold downstream sees
    * the exact sequence the sequential loop produced — FederationSpec's
    * consolidated-index identity tests cover the concurrent path.
    */
  private lazy val scatterPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(
        scatterThreads,
        (r: Runnable) => {
          val t = new Thread(r, ScatterThreadName)
          t.setDaemon(true)
          t
        }))

  /** Run the per-shard thunks concurrently, results in input order.
    * RE-ENTRANCY GUARD: a thunk that transitively calls a federated API
    * (e.g. a scatter task resolving through another federation) would
    * block a pool thread awaiting work that needs pool threads — with a
    * fixed pool that deadlocks every federated caller once K nested
    * calls are in flight. A scatter issued FROM a scatter thread
    * therefore runs its tasks inline (sequential, the pre-concurrency
    * semantics — identical results, no pool dependency).
    */
  private[graft] def scatter[A](tasks: Seq[() => A]): Seq[A] = {
    import scala.concurrent.{Await, Future}
    if (Thread.currentThread().getName == ScatterThreadName)
      return tasks.map(_())
    implicit val ec: scala.concurrent.ExecutionContext = scatterPool
    Await.result(Future.sequence(tasks.map(t => Future(t()))), scatterTimeout)
  }

  /** Each shard's persisted chunk geometry (chunkDocs from its stats
    * table), validated positive — NOT required to agree: BM25/QL
    * federation scores with global statistics, and RefScore federation
    * ranks each shard chunk-locally with its own capacity (r5), so
    * mixed fleets are first-class for both.
    */
  private[engine] def perShardChunkDocs(spark: SparkSession,
                                        shards: Seq[String]): Seq[Long] = {
    import org.apache.spark.sql.functions.{col, max}
    val gs = shards.map { d =>
      val r = graft.index.IndexStore.readStats(spark, d)
        .agg(max(col("chunkDocs"))).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
    require(gs.forall(_ > 0),
      s"federation: every shard needs persisted chunkDocs stats (got $gs)")
    gs
  }

  /** Shared chunk geometry across shards, from the persisted stats —
    * for callers that genuinely need ONE capacity (single-index serving
    * wrappers defaulting their engine geometry).
    */
  private[engine] def sharedChunkDocs(spark: SparkSession,
                                      shards: Seq[String]): Long =
    validateChunkDocs(perShardChunkDocs(spark, shards))

  /** The geometry contract in ONE place (FederatedBm25 feeds its
    * engines' memoized geometries, sharedChunkDocs the stats reads):
    * every shard must have persisted chunkDocs and all must agree.
    */
  private[engine] def validateChunkDocs(gs: Seq[Long]): Long = {
    require(gs.forall(_ > 0),
      s"federation: every shard needs persisted chunkDocs stats (got $gs)")
    require(gs.distinct.size == 1,
      s"federation: shards disagree on chunk geometry: $gs")
    gs.head
  }

  /** Per-shard docId offsets under the mergeIndexes fold rule: shard 0
    * at 0; each next shard at the first chunk boundary strictly past the
    * federated high-water so far. Derived from each shard's lineage
    * high-water (docIds are never reused, so deletes/compactions cannot
    * shrink it and silently re-pack the global space). A federated view
    * over (s0..sk) is thus docId-identical to folding s1..sk into s0
    * left-to-right with `IndexBuilder.mergeIndexes`.
    */
  private[engine] def shardOffsets(spark: SparkSession, shards: Seq[String],
                                   chunkDocs: Long): Seq[Long] =
    shardOffsetsMixed(spark, shards, Seq.fill(shards.size)(chunkDocs))

  /** The offset rule generalized to PER-SHARD geometries (mixed
    * chunkDocs fleets — per-tenant shards built at different scales):
    * each shard lands at the first boundary of its OWN chunk geometry
    * strictly past the federated high-water so far, so its local
    * docId -> chunk derivation (docId/chunkDocs_i) shifts by a whole
    * number of its own chunks and every local chunk boundary stays a
    * global one in the shard's geometry. Offsets still strictly ascend
    * past each shard's extent — the global docId space stays disjoint —
    * and the rule degenerates to the homogeneous mergeIndexes rule when
    * all geometries agree (shardOffsets delegates here).
    */
  private[engine] def shardOffsetsMixed(spark: SparkSession,
                                        shards: Seq[String],
                                        chunkDocs: Seq[Long]): Seq[Long] =
    shardLayoutMixed(spark, shards, chunkDocs)._1

  /** (docId offsets, GLOBAL chunk bases) under the mixed fold rule, from
    * one lineage high-water read per shard. The chunk base of shard i is
    * the CUMULATIVE chunk extent of shards 0..i-1 (extent = high/cd + 1
    * in each shard's OWN geometry): strictly ascending past each shard's
    * last local chunk, so global chunk ids are collision-free and
    * ordering by global chunk == lexicographic (shard asc, local chunk
    * asc) — the order the RefScore insertion fold must walk. For a
    * HOMOGENEOUS fleet this equals offsets/chunkDocs exactly (induction:
    * off_{i+1} = (off_i + high_i rounded to the next cd boundary), and
    * off_i is a cd multiple, so off_{i+1}/cd = off_i/cd + high_i/cd + 1),
    * i.e. the consolidated merged index's own docId/chunkDocs chunk ids —
    * the FederationSpec identity is unchanged by this generalization.
    */
  private[engine] def shardLayoutMixed(spark: SparkSession,
                                       shards: Seq[String],
                                       chunkDocs: Seq[Long])
      : (Seq[Long], Seq[Long]) = {
    require(shards.size == chunkDocs.size,
      s"federation: ${shards.size} shards vs ${chunkDocs.size} geometries")
    layoutFromHighs(shards.map(d => IndexBuilder.docIdHighWater(spark, d)),
      chunkDocs)
  }

  /** The fold-rule arithmetic itself, pure (FederationSpec's property
    * sweep pins its invariants: offsets chunk-aligned per shard and
    * strictly past every prior extent ⇒ disjoint global docId spaces;
    * chunk bases strictly past every prior shard's last global chunk ⇒
    * collision-free (shard asc, local chunk asc) order; homogeneous ⇒
    * bases == offsets / chunkDocs exactly).
    */
  private[graft] def layoutFromHighs(highs: Seq[Long],
                                     chunkDocs: Seq[Long])
      : (Seq[Long], Seq[Long]) = {
    val offs = Seq.newBuilder[Long]
    val bases = Seq.newBuilder[Long]
    var cursor = -1L // federated high-water of the shards placed so far
    var chunkBase = 0L // cumulative chunk extents of the shards placed
    highs.zip(chunkDocs).foreach { case (h, cd) =>
      val off = if (cursor < 0) 0L else (cursor / cd + 1L) * cd
      offs += off
      bases += chunkBase
      chunkBase += h / cd + 1L
      cursor = math.max(cursor, off + h)
    }
    (offs.result(), bases.result())
  }
}

/** Scatter-gather REFERENCE-score search over K independently-built shard
  * indexes — the reference's serving path itself (frontEnd/webServer.cpp:
  * 858 HandleSearch → communicationServer.h:118-130 DistributeMessage to
  * the 8 index-server IPs → per-machine ranking → front-end fan-in):
  * unlike BM25, RefScore has NO global collection statistics — every
  * score is chunk-local (per-chunk expected tf, chunk-capacity length
  * normalization) — so federation needs no stats exchange at all: each
  * shard ranks its own chunks with the frozen kernels, per-chunk slot
  * lists are remapped into the mergeIndexes global (chunk, docId) space,
  * and ONE [[graft.rank.RefRanker.mergeChunkResults]] fold in ascending
  * GLOBAL chunk order reproduces the reference's order-dependent
  * insertion dedup exactly. Result: docId- and score-identical to the
  * consolidated merged index (FederationSpec pins it; q_fed_ref_topk
  * driver-checks a chunk-aligned split whose global view coincides with
  * the whole-corpus index, reusing the q_ref_topk replay verbatim).
  */
class FederatedSearch(spark: SparkSession, shards: Seq[String],
                      stagedChunkThreshold: Int =
                        graft.config.GraftConfig.StagedMergeChunks,
                      broadcastDocsLimit: Long = 2000000L) {
  require(shards.nonEmpty, "FederatedSearch: need at least one shard index")

  /** Per-shard chunk geometries — MIXED fleets are allowed (r5): every
    * RefScore quantity is chunk-local (per-chunk expected tf, length
    * norm over the shard's OWN capacity, ranker.h:802-804), which is
    * exactly how the reference's per-machine servers behave when their
    * config.h values differ — so each shard ranks with its own
    * geometry and only the FOLD ORDER is shared: ascending GLOBAL
    * chunk ids from cumulative per-shard extents
    * ([[Federation.shardLayoutMixed]]). For a homogeneous fleet the
    * ids coincide with offsets/chunkDocs and the consolidated-index
    * identity holds verbatim; for a mixed fleet no consolidated twin
    * exists (one index has one capacity) and the contract is the
    * sequential per-shard fold, pinned against the single-threaded
    * RefOracle in FederationSpec and driver-DuckDB-checked end-to-end
    * by q_fed_ref_mixed_topk.
    */
  private val geometries: Seq[Long] = Federation.perShardChunkDocs(spark, shards)
  private val engines: Seq[SearchEngine] =
    shards.zip(geometries).map { case (d, cd) =>
      new SearchEngine(spark, d, chunkCapacity = cd,
        broadcastDocsLimit = broadcastDocsLimit)
    }

  /** Whether the LAST search's gather took the staged path — a test
    * probe (StagedMergeSpec asserts engagement: shards on the resident-
    * sidecar plan return resolved rows, whose qualifying count is 0, so
    * threshold 0 alone cannot force staging — the spec must also force
    * the cogroup plan via broadcastDocsLimit = 0).
    */
  @volatile private[graft] var lastGatherStaged: Boolean = false

  /** mergeIndexes fold-rule docId offsets + global chunk bases (one
    * lineage read per shard — see [[Federation.shardLayoutMixed]]).
    */
  private val layout = Federation.shardLayoutMixed(spark, shards, geometries)
  val offsets: Seq[Long] = layout._1
  private val bases: Seq[Long] = layout._2

  /** Rank-identical federated reference scoring: the scatter submits
    * each shard's chunk-pruned kernel job concurrently
    * ([[Federation.scatter]], results in shard order); the gather
    * remaps (chunk, docId) into the global space and folds ALL shards'
    * slot lists through the reference's cross-chunk insertion merge in
    * ascending global chunk order. Past `stagedChunkThreshold` total
    * qualifying chunks the gather goes STAGED: the shards' hit Datasets
    * union (so the dup census is GLOBAL — cross-shard dup urls are
    * exactly what a shard-local census would miss) and
    * [[SearchEngine.stagedPrune]] cuts the driver collect to
    * O(partitions·topK + dup families); StagedMergeSpec pins the
    * federated staged == plain identity on an overlapping-shard fixture.
    */
  def search(query: String, topK: Int = GraftConfig.TopK)
      : Seq[graft.rank.DocScore] = {
    val (astOpt, flat) = graft.query.QueryParser.parseQuery(query)
    astOpt match {
      case None => Seq.empty
      case Some(ast) =>
        import spark.implicits._
        // scatter WITHOUT forcing per-shard collects: each shard hands
        // back either resolved rows or its lazy hit Dataset + qualifying
        // count, remapped into the global (chunk, docId) space
        val parts = Federation.scatter(engines.zip(offsets).zip(bases).map {
          case ((e, off), base) => () =>
            e.searchChunksEither(ast, flat, topK) match {
              case Left(hs) => Left(hs.map(h =>
                h.copy(chunk = h.chunk + base, docId = h.docId + off)))
              case Right((ds, nq)) => Right((ds.map(h =>
                h.copy(chunk = h.chunk + base, docId = h.docId + off)), nq))
            }
        })
        val totalQualifying = parts.collect { case Right((_, n)) => n }.sum
        lastGatherStaged = totalQualifying > stagedChunkThreshold
        val hits: Seq[ChunkHit] =
          if (totalQualifying <= stagedChunkThreshold)
            Federation.scatter(parts.map {
              case Left(hs) => () => hs
              case Right((ds, _)) => () => ds.collect().toSeq
            }).flatten
          else {
            // staged gather: union ALL shards' hit sets so the census
            // sees CROSS-SHARD dup urls / (title, score) pairs — a
            // shard-local census would prune clean-looking rows whose
            // dup twin lives in another shard
            val dss = parts.map {
              case Left(hs) => spark.createDataset(hs)
              case Right((ds, _)) => ds
            }
            SearchEngine.stagedPrune(spark, dss.reduce(_ unionByName _), topK)
          }
        val merged = graft.rank.RefRanker.mergeChunkResults(
          hits.groupBy(_.chunk).view.mapValues { hs =>
            hs.sortBy(_.slot)
              .map(h => graft.rank.DocScore(h.title, h.summary, h.url,
                h.score, h.docId)).toArray
          }.toSeq, topK)
        merged.filter(_.url.nonEmpty).toSeq
    }
  }

  /** RESULTS_PER_PAGE slice — the front end's pagination over the
    * federated fan-in (webServer.cpp:737-757).
    */
  def searchPage(query: String, page: Int, perPage: Int = 10)
      : Seq[graft.rank.DocScore] =
    search(query).slice(page * perPage, (page + 1) * perPage)
}
