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
  * Scale shape: the scatter is a driver loop over shard engines (the
  * per-shard jobs are the same chunk-pruned kernels the single-index
  * engine runs — Bloom sidecars, WAND, broadcast lens gates all apply
  * per shard); the gather merges K sorted top-k lists (≤ K·k rows on the
  * driver, never data-sized). Global top-k ⊆ union of per-shard top-k
  * because every global winner is a fortiori in its own shard's top-k
  * under identical stats.
  */
class FederatedBm25(spark: SparkSession, shards: Seq[String]) {
  require(shards.nonEmpty, "FederatedBm25: need at least one shard index")

  private val engines: Seq[Bm25Engine] =
    shards.map(d => new Bm25Engine(spark, d))

  /** Shared chunk geometry — the offset rule is chunk-aligned, so mixed
    * geometries would let a shifted shard straddle global chunk
    * boundaries (the same precondition mergeIndexes enforces).
    */
  private val chunkDocs: Long =
    Federation.validateChunkDocs(engines.map(_.chunkGeometry))

  /** Per-shard docId offsets under the mergeIndexes fold rule (shared
    * helper — see [[Federation.shardOffsets]]).
    */
  val offsets: Seq[Long] = Federation.shardOffsets(spark, shards, chunkDocs)

  /** Global (N, avgdl): raw sums folded across shards, never a mean of
    * per-shard means.
    */
  lazy val corpusStats: (Long, Double) = {
    val nts = engines.map(_.statsNT)
    val n = nts.map(_._1).sum
    (n, nts.map(_._2).sum.toDouble / math.max(n, 1L).toDouble)
  }

  /** The df-exchange: per-term document frequency summed across shards
    * (each shard's probe is a pushed parquet aggregate, memoized in that
    * shard's engine so repeat queries pay nothing). Zero-df terms drop.
    */
  def globalDf(terms: Seq[String]): Map[String, Long] =
    engines.flatMap(_.shardDf(terms).toSeq)
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
    val merged = engines.zip(offsets).flatMap { case (e, off) =>
      e.searchTermsWithStats(terms, k, idfMap, avgdl, mode, useWand)
        .map(h => h.copy(docId = h.docId + off))
    }
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
    val totalC = engines.map(_.statsNT._2).sum
    val cf = engines.flatMap(_.shardCf(base).toSeq)
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      .filter(_._2 > 0L)
    if (cf.isEmpty || totalC == 0L) return Seq.empty
    val kept = base.filter(cf.contains)
    val pcMap = kept.map(t => t -> cf(t).toDouble / totalC.toDouble).toMap
    val merged = engines.zip(offsets).flatMap { case (e, off) =>
      e.searchTermsQlWithStats(kept, k, pcMap, mu)
        .map(h => h.copy(docId = h.docId + off))
    }
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
    val meta: Map[Long, (String, String)] =
      hits.groupBy(h => ownerOf(h.docId)).flatMap { case (i, hs) =>
        val local = hs.map(_.docId - offsets(i))
        engines(i).resolveMeta(local).map { case (id, ut) =>
          (id + offsets(i)) -> ut
        }
      }
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
  /** Shared chunk geometry across shards, from the persisted stats
    * (the offset rule is chunk-aligned, so mixed geometries would let a
    * shifted shard straddle global chunk boundaries — the mergeIndexes
    * precondition applied shard-wise).
    */
  private[engine] def sharedChunkDocs(spark: SparkSession,
                                      shards: Seq[String]): Long = {
    import org.apache.spark.sql.functions.{col, max}
    validateChunkDocs(shards.map { d =>
      val r = graft.index.IndexStore.readStats(spark, d)
        .agg(max(col("chunkDocs"))).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    })
  }

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
                                   chunkDocs: Long): Seq[Long] = {
    val highs = shards.map(d => IndexBuilder.docIdHighWater(spark, d))
    val offs = Seq.newBuilder[Long]
    var cursor = -1L // federated high-water of the shards placed so far
    highs.foreach { h =>
      val off = if (cursor < 0) 0L else (cursor / chunkDocs + 1L) * chunkDocs
      offs += off
      cursor = math.max(cursor, off + h)
    }
    offs.result()
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
class FederatedSearch(spark: SparkSession, shards: Seq[String]) {
  require(shards.nonEmpty, "FederatedSearch: need at least one shard index")

  private val chunkDocs: Long = Federation.sharedChunkDocs(spark, shards)
  private val engines: Seq[SearchEngine] =
    shards.map(d => new SearchEngine(spark, d, chunkCapacity = chunkDocs))

  /** mergeIndexes fold-rule offsets; chunk bases are offsets/chunkDocs. */
  val offsets: Seq[Long] = Federation.shardOffsets(spark, shards, chunkDocs)
  private val bases: Seq[Long] = offsets.map(_ / chunkDocs)

  /** Rank-identical federated reference scoring: the scatter is a driver
    * loop over shard engines (each one chunk-pruned kernel job); the
    * gather remaps (chunk, docId) into the global space and folds ALL
    * shards' slot lists through the reference's cross-chunk insertion
    * merge in ascending global chunk order.
    */
  def search(query: String, topK: Int = GraftConfig.TopK)
      : Seq[graft.rank.DocScore] = {
    val (astOpt, flat) = graft.query.QueryParser.parseQuery(query)
    astOpt match {
      case None => Seq.empty
      case Some(ast) =>
        val hits = engines.zip(offsets).zip(bases).flatMap {
          case ((e, off), base) =>
            e.searchChunks(ast, flat, topK)
              .map(h => h.copy(chunk = h.chunk + base, docId = h.docId + off))
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
