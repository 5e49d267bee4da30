package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.index.IndexStore
import graft.rank.Bm25
import graft.tokenizer.Tokenizer

/** BM25 scored result. */
case class Bm25Hit(docId: Long, score: Double, url: String, title: String)

/** One term's contribution to one top-k doc's BM25 score (the explain
  * instrument, [[Bm25Engine.searchTermsExplain]]); raw doubles — callers
  * round at their presentation boundary.
  */
case class Bm25ExplainRow(docId: Long, term: String, tf: Long, df: Long,
                          idf: Double, tfPart: Double, contribution: Double,
                          score: Double)

/** Distributed BM25 top-k over the compressed index chunks. Global
  * statistics (N, avgdl, per-term df) are computed with Catalyst
  * aggregates over the stats table + the pruned postings and broadcast
  * into the per-chunk kernels (SURVEY.md §2.9); per-chunk top-k lists are
  * merged on the driver by (score desc, docId asc).
  */
class Bm25Engine(spark: SparkSession, indexDir: String, cache: Boolean = true,
                 broadcastDocsLimit: Long = 2000000L,
                 broadcastDocsBytes: Long = 256L << 20) {
  import spark.implicits._

  private val postings = {
    val p = IndexStore.readPostings(spark, indexDir)
    if (cache) p.cache() else p
  }
  private val docs = {
    val d = IndexStore.readDocs(spark, indexDir)
    if (cache) d.cache() else d
  }

  /** Bloom chunk-skip sidecar present? (built opt-in via
    * graft.index.BloomSidecar.build — existence probed once per engine).
    */
  private lazy val bloomAvailable = graft.index.IndexBuilder.pathExists(
    spark, graft.index.BloomSidecar.metaDir(indexDir))

  /** (chunk -> docId -> docLength), broadcast once when it fits; larger
    * indexes fall back to the per-query cogroup (see SearchEngine's
    * resident-sidecar rationale). Gated on rows AND estimated bytes via
    * the shared [[BroadcastGate]] (fixed-width payload: 3 longs + map
    * entry overhead per row), aligned with SearchEngine's sidecar gate.
    */
  private lazy val lensBroadcast: Option[org.apache.spark.broadcast.Broadcast[Map[Long, java.util.HashMap[java.lang.Long, java.lang.Double]]]] = {
    if (BroadcastGate.fits(docs.toDF(), lit(64L),
        broadcastDocsLimit, broadcastDocsBytes)) {
      val grouped = docs.select($"chunk", $"docId", $"docLength")
        .as[(Long, Long, Long)].collect().groupBy(_._1)
        .map { case (c, arr) =>
          val m = new java.util.HashMap[java.lang.Long, java.lang.Double](arr.length * 2)
          arr.foreach { case (_, id, len) => m.put(id, len.toDouble) }
          c -> m
        }
      Some(spark.sparkContext.broadcast(grouped))
    } else None
  }

  /** One stats job: N, total token count (exact Long — the Dirichlet
    * ranker's collection-model denominator), and the index's configured
    * docs-per-chunk (persisted by buildStats so docId -> chunk is
    * derivable for partition pruning).
    */
  /** Champion-sidecar meta, cached against the meta table's CONTENT
    * FINGERPRINT (child file names + lengths + mtimes — not mtime
    * alone: two rebuilds inside one mtime tick still differ because a
    * fresh parquet write's part names carry a new UUID): the hot path
    * pays one driver-side FS listing (no Spark job) per query instead
    * of a parquet head read, but a re-tuned sidecar
    * (ChampionSidecar.build with different m/nBuckets moves NO serving
    * token — the serving layer cannot reload for it) or an in-flight
    * onCompact repair (meta transiently deleted) is seen immediately:
    * fingerprint moved ⇒ re-read; meta missing or unreadable ⇒ None ⇒
    * the exact inline path. The probe-time docId high-water STALENESS
    * check is separate and never cached.
    */
  private val championMetaCache =
    new java.util.concurrent.atomic.AtomicReference[(Long, Option[(Int, Int, Long, Long)])]()
  private def championMeta: Option[(Int, Int, Long, Long)] = {
    val metaDir = graft.index.ChampionSidecar.champMetaDir(indexDir)
    val mt = graft.index.IndexBuilder.pathFingerprint(spark, metaDir)
    if (mt < 0L) { championMetaCache.set(null); return None }
    val cached = championMetaCache.get()
    if (cached != null && cached._1 == mt) cached._2
    else {
      val m =
        try Some(graft.index.ChampionSidecar.readMeta(spark, indexDir))
        catch { case _: Exception => None } // deleted between stat & read
      championMetaCache.set((mt, m))
      m
    }
  }

  private lazy val globalStats: (Long, Double, Long, Long) = {
    val row = IndexStore.readStats(spark, indexDir)
      .agg(sum($"numDocs"), sum($"totalTokens"), max($"chunkDocs")).head()
    if (row.isNullAt(0)) (0L, 0.0, GraftConfig.ChunkDocs, 0L) // empty index
    else {
      val n = row.getLong(0)
      (n, row.getLong(1).toDouble / math.max(n, 1L).toDouble, row.getLong(2),
        row.getLong(1))
    }
  }

  /** (N, avgdl) over pure token lengths (title + body, no EndDoc). */
  lazy val corpusStats: (Long, Double) = (globalStats._1, globalStats._2)

  /** (N, total kept tokens) — the raw sums the federation layer folds
    * across shards (a mean of means is not the global avgdl).
    */
  private[engine] def statsNT: (Long, Long) = (globalStats._1, globalStats._4)

  /** This shard's document frequencies for the federation df-exchange
    * (memoized like every local query's).
    */
  private[engine] def shardDf(terms: Seq[String]): Map[String, Long] =
    globalDf(terms)

  /** Persisted docs-per-chunk geometry (-1 sentinel on legacy stats). */
  private[engine] def chunkGeometry: Long = chunkDocsConf

  private def chunkDocsConf: Long = globalStats._3

  /** Exact corpus token count (title + body kept tokens). */
  private def totalTokens: Long = globalStats._4

  /** Retrieval mode, hoisted to the companion so engines over DIFFERENT
    * shard indexes share one type (the federation layer passes a mode
    * across engines); the instance aliases keep `engine.Or` call sites
    * source-compatible.
    */
  type Mode = Bm25Engine.Mode
  val Or: Bm25Engine.Or.type = Bm25Engine.Or     // WAND path
  val And: Bm25Engine.And.type = Bm25Engine.And  // leapfrog intersection

  /** Global-df memo. One engine serves concurrent queries (the
    * pthread-per-request analog, index/indexServer.cpp:178-198), so the
    * memo is a ConcurrentHashMap — a plain mutable map raced on resize
    * (Bm25Spec's concurrent-query smoke test pins this). A term may be
    * computed twice under contention; both writers store the same value.
    */
  private val dfCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Global df per term (Catalyst aggregate, tiny result), memoized per
    * engine so repeat queries pay no stats job; terms with df 0 are
    * dropped from the result (but cached, so they are never re-probed).
    */
  private def globalDf(terms: Seq[String]): Map[String, Long] = {
    val missing = terms.filterNot(dfCache.containsKey)
    if (missing.nonEmpty) {
      postings.filter($"term".isin(missing: _*))
        .groupBy($"term").agg(sum($"df").as("df"))
        .collect().foreach(r => dfCache.put(r.getString(0), r.getLong(1)))
      missing.foreach(t => dfCache.putIfAbsent(t, 0L))
    }
    terms
      .flatMap(t => Option(dfCache.get(t)).map(_.longValue).filter(_ > 0).map(t -> _))
      .toMap
  }

  /** Tokenize the query with the frozen body-token rules, score top-k. */
  def search(query: String, k: Int = GraftConfig.TopK, mode: Mode = Or,
             useWand: Boolean = true): Seq[Bm25Hit] = {
    val terms = Tokenizer.bodyTokens(query).distinct.toSeq
    if (terms.isEmpty) return Seq.empty
    val hits = searchTerms(terms, k, mode, useWand)
    if (hits.isEmpty) return Seq.empty
    // resolve doc metadata for the final k docIds only. The chunk
    // predicate (chunk = docId / chunkDocs) prunes the chunk-partitioned
    // docs table to the <= k directories that contain a hit — without it
    // this is a full docs-table scan per query at scale. Legacy indexes
    // whose stats predate the chunkDocs column (sentinel -1) skip the
    // predicate entirely rather than pruning with a guessed value that
    // would silently match no partitions.
    val meta = resolveMeta(hits.map(_.docId))
    hits.map(h => Bm25Hit(h.docId, h.score,
      meta.get(h.docId).map(_._1).getOrElse(""),
      meta.get(h.docId).map(_._2).getOrElse("")))
  }

  /** (docId -> (url, title)) for a FINAL top-k id list — chunk-pruned to
    * the <= k directories holding a hit (shared by [[search]] and the
    * federation layer, which resolves each global hit from its owning
    * shard's docs table).
    */
  private[engine] def resolveMeta(ids: Seq[Long]): Map[Long, (String, String)] = {
    if (ids.isEmpty) return Map.empty
    val pruned =
      if (chunkDocsConf > 0) {
        val hitChunks = ids.map(_ / chunkDocsConf).distinct
        docs.filter($"chunk".isin(hitChunks: _*) && $"docId".isin(ids: _*))
      } else docs.filter($"docId".isin(ids: _*))
    pruned
      .select($"docId", $"url", $"title").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
  }

  /** Per-field corpus averages for BM25F, one column-pruned docs
    * aggregate per engine: (avg body length, avg title length) where
    * title length := numTitleWords (the reference's stored title stat and
    * its own title-rank denominator, ranker/ranker.h:668) and body length
    * := docLength - numTitleWords clamped at 0 (equals the kept body
    * count whenever every title word passes the <20-char filter).
    */
  private lazy val fieldStats: (Double, Double) = {
    val row = docs.toDF().agg(
      avg(greatest($"docLength" - $"numTitleWords", lit(0L)).cast("double")),
      avg($"numTitleWords".cast("double"))).head()
    if (row.isNullAt(0)) (0.0, 0.0) else (row.getDouble(0), row.getDouble(1))
  }

  /** (chunk -> docId -> [body length, title length]) for the fielded
    * scorer; broadcast under the same gate as [[lensBroadcast]], with the
    * same per-query cogroup fallback for indexes that do not fit.
    */
  private lazy val fieldedLensBroadcast: Option[org.apache.spark.broadcast.Broadcast[Map[Long, java.util.HashMap[java.lang.Long, Array[Double]]]]] = {
    if (BroadcastGate.fits(docs.toDF(), lit(96L),
        broadcastDocsLimit, broadcastDocsBytes)) {
      val grouped = docs.select($"chunk", $"docId", $"docLength", $"numTitleWords")
        .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
        .map { case (c, arr) =>
          val m = new java.util.HashMap[java.lang.Long, Array[Double]](arr.length * 2)
          arr.foreach { case (_, id, dl, tw) =>
            m.put(id, Array(math.max(dl - tw, 0L).toDouble, tw.toDouble))
          }
          c -> m
        }
      Some(spark.sparkContext.broadcast(grouped))
    } else None
  }

  /** BM25F field-weighted top-k (disjunctive). The index already holds
    * both fields of every document — title terms are '#'-decorated lists
    * in the same chunk (ranker/ranker.h:742-745) — so no new storage is
    * read: the term scan prunes to `term IN (t..., '#'+t...)`, idf comes
    * from the per-term body∪title document frequency (chunk-local merge
    * counts summed on the driver; docIds are chunk-disjoint), and one
    * per-chunk kernel job scores with per-field length normalization
    * ([[Bm25.scoreBm25F]]). Deterministic order (score desc, docId asc).
    */
  def searchTermsFielded(terms: Seq[String], k: Int,
                         wBody: Double = 1.0, wTitle: Double = 2.5): Seq[Bm25.Hit] = {
    val (n, _) = corpusStats
    val base = terms.distinct
    if (base.isEmpty || n == 0L) return Seq.empty
    val all = base ++ base.map("#" + _)
    val posts = postings.filter($"term".isin(all: _*))

    def splitFields(ps: Iterator[graft.index.PostingRow])
        : Map[String, (Option[(Long, Array[Byte])], Option[(Long, Array[Byte])])] =
      ps.foldLeft(Map.empty[String, (Option[(Long, Array[Byte])], Option[(Long, Array[Byte])])]) {
        (m, p) =>
          val (t, isTitle) =
            if (p.term.startsWith("#")) (p.term.substring(1), true)
            else (p.term, false)
          val (b, ti) = m.getOrElse(t, (None, None))
          val entry = Some((p.df, p.postingsBlob))
          m.updated(t, if (isTitle) (b, entry) else (entry, ti))
      }

    // union df per base term: per-(chunk, term) ascending-docId merge
    // counts (tiny: <= #qualifying-chunks x #terms rows), summed driver-side
    val dfU: Map[String, Long] = posts
      .groupByKey(_.chunk)
      .flatMapGroups { (_, ps) =>
        splitFields(ps).iterator.map { case (t, (b, ti)) =>
          (t, Bm25.unionDf(b, ti))
        }
      }.collect().groupBy(_._1).map { case (t, arr) => t -> arr.map(_._2).sum }
      .filter(_._2 > 0L)
    if (dfU.isEmpty) return Seq.empty
    val idfMap = dfU.map { case (t, df) => t -> Bm25.idf(n, df) }
    val idfB = spark.sparkContext.broadcast(idfMap)
    val (avgB, avgT) = fieldStats

    def score(fields: Map[String, (Option[(Long, Array[Byte])], Option[(Long, Array[Byte])])],
              dlB: Bm25.DocLen, dlT: Bm25.DocLen): Iterator[Bm25.Hit] = {
      val lists = fields.iterator.collect {
        case (t, (b, ti)) if idfB.value.contains(t) =>
          Bm25.FieldLists(t, idfB.value(t), b, ti)
      }.toSeq
      if (lists.isEmpty) Iterator.empty
      else Bm25.scoreBm25F(lists, dlB, dlT, avgB, avgT, wBody, wTitle, k).iterator
    }

    val perChunk = fieldedLensBroadcast match {
      case Some(bc) =>
        posts.groupByKey(_.chunk).flatMapGroups { (chunk, ps) =>
          bc.value.get(chunk) match {
            case None => Iterator.empty
            case Some(lens) =>
              score(splitFields(ps), id => lens.get(id)(0), id => lens.get(id)(1))
          }
        }.collect()
      case None =>
        // big-index path: prune docs to the chunks that hold any field list
        val qualifying = posts.select($"chunk").distinct().as[Long].collect()
        if (qualifying.isEmpty) return Seq.empty
        val postsQ = posts.filter($"chunk".isin(qualifying: _*))
        val docsQ = docs.filter($"chunk".isin(qualifying: _*))
          .select($"chunk", $"docId", $"docLength", $"numTitleWords")
          .as[(Long, Long, Long, Long)]
        postsQ.groupByKey(_.chunk)
          .cogroup(docsQ.groupByKey(_._1)) { (_, ps, ds) =>
            val lens = new java.util.HashMap[java.lang.Long, Array[Double]]()
            ds.foreach { case (_, id, dl, tw) =>
              lens.put(id, Array(math.max(dl - tw, 0L).toDouble, tw.toDouble))
            }
            if (lens.isEmpty) Iterator.empty
            else score(splitFields(ps), id => lens.get(id)(0), id => lens.get(id)(1))
          }
          .collect()
    }
    perChunk.sorted(Bm25.better.reverse).take(k).toSeq
  }

  /** Global collection frequency per term (sum of per-chunk list tfs —
    * one pushed-filter aggregate), memoized like [[globalDf]].
    */
  private val cfCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def globalCf(terms: Seq[String]): Map[String, Long] = {
    val missing = terms.filterNot(cfCache.containsKey)
    if (missing.nonEmpty) {
      postings.filter($"term".isin(missing: _*))
        .groupBy($"term").agg(sum($"tf").as("cf"))
        .collect().foreach(r => cfCache.put(r.getString(0), r.getLong(1)))
      missing.foreach(t => cfCache.putIfAbsent(t, 0L))
    }
    terms
      .flatMap(t => Option(cfCache.get(t)).map(_.longValue).filter(_ > 0).map(t -> _))
      .toMap
  }

  /** Dirichlet query-likelihood top-k ([[Bm25.scoreQl]]) — the LM ranking
    * family over the same index scan: collection model p(t|C) from the
    * per-term cf aggregate over the exact stats-table token total, scored
    * per chunk with the plain lens broadcast/cogroup gate. Terms absent
    * from the corpus (cf = 0) are dropped — standard OOV handling, since
    * p(t|C) = 0 would zero every document's likelihood. Deterministic
    * (score desc, docId asc); scores are log-likelihoods (negative
    * values; higher = more likely).
    */
  def searchTermsQl(terms: Seq[String], k: Int, mu: Double = 300.0): Seq[Bm25.Hit] = {
    val (n, _) = corpusStats
    val base = terms.distinct
    if (base.isEmpty || n == 0L) return Seq.empty
    val totalC = totalTokens
    val cfMap = globalCf(base)
    if (cfMap.isEmpty || totalC == 0L) return Seq.empty
    val kept = base.filter(cfMap.contains)
    val pcMap = kept.map(t => t -> cfMap(t).toDouble / totalC.toDouble).toMap
    searchTermsQlWithStats(kept, k, pcMap, mu)
  }

  /** This shard's collection frequencies for the federation cf-exchange
    * (memoized like every local query's).
    */
  private[engine] def shardCf(terms: Seq[String]): Map[String, Long] =
    globalCf(terms)

  /** The scoring phase of [[searchTermsQl]] with the collection model
    * p(t|C) supplied by the caller — the [[FederatedBm25]] hook: QL's
    * global statistics are the collection LM (cf / total tokens), so the
    * federation exchange folds cf and token totals across shards and
    * every shard smooths against the same background distribution.
    * `kept` must contain only terms present in pcMap.
    */
  private[engine] def searchTermsQlWithStats(kept: Seq[String], k: Int,
      pcMap: Map[String, Double], mu: Double): Seq[Bm25.Hit] = {
    if (kept.isEmpty) return Seq.empty
    val pcB = spark.sparkContext.broadcast(pcMap)
    val orderB = spark.sparkContext.broadcast(kept.zipWithIndex.toMap)
    val posts = postings.filter($"term".isin(kept: _*))
    val muV = mu
    val kk = k

    def toQl(ps: Iterator[graft.index.PostingRow]): Seq[Bm25.QlTerm] =
      ps.filter(p => pcB.value.contains(p.term)).map { p =>
        Bm25.QlTerm(p.term, pcB.value(p.term), p.df, p.postingsBlob)
      }.toSeq.sortBy(p => orderB.value(p.term))

    val perChunk = lensBroadcast match {
      case Some(bc) =>
        posts.groupByKey(_.chunk).flatMapGroups { (chunk, ps) =>
          bc.value.get(chunk) match {
            case None => Iterator.empty
            case Some(lens) =>
              val lists = toQl(ps)
              if (lists.isEmpty) Iterator.empty
              else Bm25.scoreQl(lists, id => lens.get(id), muV, kk).iterator
          }
        }.collect()
      case None =>
        val qualifying = posts.select($"chunk").distinct().as[Long].collect()
        if (qualifying.isEmpty) return Seq.empty
        val postsQ = posts.filter($"chunk".isin(qualifying: _*))
        val docsQ = docs.filter($"chunk".isin(qualifying: _*))
          .select($"chunk", $"docId", $"docLength")
          .as[(Long, Long, Long)]
        postsQ.groupByKey(_.chunk)
          .cogroup(docsQ.groupByKey(_._1)) { (_, ps, ds) =>
            val lens = new java.util.HashMap[java.lang.Long, java.lang.Double]()
            ds.foreach { case (_, id, len) => lens.put(id, len.toDouble) }
            val lists = toQl(ps)
            if (lens.isEmpty || lists.isEmpty) Iterator.empty
            else Bm25.scoreQl(lists, id => lens.get(id), muV, kk).iterator
          }.collect()
    }
    perChunk.sorted(Bm25.better.reverse).take(k).toSeq
  }

  /** Pseudo-relevance feedback (Rocchio/Robertson query expansion — the
    * classic two-pass retrieval loop): pass 1 retrieves the top-`r`
    * feedback docs with plain BM25; candidate expansion terms are every
    * body term occurring in a feedback doc (extracted from the index by
    * decoding ONLY the feedback docs' chunk partitions — r docs live in
    * <= r chunks, so the forward-index scan is delta-sized, never
    * corpus-sized), ranked by the Robertson-style offer weight
    * rdf(t) · idf(t) (feedback-doc frequency × global idf; global df for
    * the tiny candidate set comes from one column-pruned (term, df)
    * dictionary aggregate broadcast-joined on the candidates) with
    * deterministic (weight desc, term asc) ties; pass 2 re-runs BM25 over
    * the original + top-`e` expansion terms. Returns (expansion, hits).
    */
  def searchTermsPrf(terms: Seq[String], k: Int, r: Int = 5, e: Int = 3)
      : (Seq[String], Seq[Bm25.Hit]) = {
    val base = terms.distinct
    if (e <= 0) return (Seq.empty, searchTerms(base, k))
    val fb = searchTerms(base, r)
    if (fb.isEmpty) return (Seq.empty, Seq.empty)
    val (n, _) = corpusStats
    val origSet = base.toSet
    val fbB = spark.sparkContext.broadcast(fb.map(_.docId).toSet)
    val candPruned =
      if (chunkDocsConf > 0) {
        val cs = fb.map(_.docId / chunkDocsConf).distinct
        postings.filter($"chunk".isin(cs: _*))
      } else postings
    // feedback-doc frequency per candidate term; candidate count is
    // bounded by the feedback docs' combined vocabulary
    val rdf: Map[String, Long] = candPruned.flatMap { p =>
      if (p.term.startsWith("#") || origSet.contains(p.term)) None
      else {
        val c = graft.codec.PostingCodec.decode(p.df, p.postingsBlob)
          .count { case (id, _) => fbB.value.contains(id) }
        if (c > 0) Some((p.term, c.toLong)) else None
      }
    }.collect().groupBy(_._1).map { case (t, a) => t -> a.map(_._2).sum }
    if (rdf.isEmpty) return (Seq.empty, searchTerms(base, k))
    val candDs = rdf.keys.toSeq.toDF("term")
    val idfCand = postings.toDF()
      .join(org.apache.spark.sql.functions.broadcast(candDs), "term")
      .groupBy($"term").agg(sum($"df").as("df")).collect()
      .map(row => row.getString(0) -> Bm25.idf(n, row.getLong(1))).toMap
    val expansion = rdf.keys.toSeq
      .map(t => (t, rdf(t).toDouble * idfCand.getOrElse(t, 0.0)))
      .sortBy { case (t, ow) => (-ow, t) }
      .take(e).map(_._1)
    (expansion, searchTerms(base ++ expansion, k))
  }

  /** Repo-collapsed BM25 top-k — the "site collapse" every search UI
    * applies (at most `perRepo` hits from any one repository), the
    * code-corpus analog of the reference ranker's duplicate-URL drop
    * (ranker/ranker.h dedup, applied one level up). Two-phase grouped
    * retrieval: rank the top-`pool` global candidates, resolve their
    * repos with ONE chunk-pruned metadata lookup (pool-sized, never the
    * corpus), then walk the pool in score order keeping a doc iff its
    * repo has fewer than `perRepo` kept hits. Exact whenever the
    * collapsed top-k lies within the pool — size `pool` accordingly
    * (k * perRepo-th order statistics; the default 100 covers k=30
    * comfortably). Returns (docId, score, repo).
    *
    * repo = the url's first two segments (`org/proj` of the
    * Corpus.url derivation `repo/path@commit`).
    */
  def searchTermsCollapsed(terms: Seq[String], k: Int, perRepo: Int = 2,
                           pool: Int = 100): Seq[(Bm25.Hit, String)] = {
    require(perRepo > 0 && pool >= k, "need perRepo > 0 and pool >= k")
    val hits = searchTerms(terms, pool, Or)
    if (hits.isEmpty) return Seq.empty
    val ids = hits.map(_.docId)
    val metaSrc =
      if (chunkDocsConf > 0) {
        val cs = ids.map(_ / chunkDocsConf).distinct
        docs.filter($"chunk".isin(cs: _*))
      } else docs
    val urlOf = metaSrc.filter($"docId".isin(ids: _*))
      .select($"docId", $"url").as[(Long, String)].collect().toMap
    val repoOf = (id: Long) =>
      urlOf.getOrElse(id, "").split('/').take(2).mkString("/")
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Bm25.Hit, String)]
    val perRepoCount = scala.collection.mutable.HashMap.empty[String, Int]
    val it = hits.iterator
    while (kept.size < k && it.hasNext) {
      val h = it.next()
      val r = repoOf(h.docId)
      val c = perRepoCount.getOrElse(r, 0)
      if (c < perRepo) { perRepoCount(r) = c + 1; kept += ((h, r)) }
    }
    kept.toSeq
  }

  /** Freshness-filtered BM25 top-k: only documents with
    * docId > `sinceDocId` compete — "new results since the last crawl",
    * the query-side pairing of the daily-delta `appendBuild` story
    * (docIds only move upward, so a docId mark IS a recency cutoff —
    * the TimeTravel invariant read in the other direction). Collection
    * statistics stay GLOBAL (standard filtered-retrieval semantics: the
    * filter narrows candidates, not idf/avgdl).
    *
    * Scale shape: chunks entirely at or below the mark are pruned
    * BEFORE any read (`chunk >= mark div chunkDocs` — partition
    * pruning, the postingsAsOf trick reversed); only the ONE boundary
    * chunk's lists are decode-filter-reencoded (positions are
    * doc-local — the compact invariant — so the transcode is exact) and
    * the frozen kernels then run unchanged on all of them. A legacy
    * index without persisted chunkDocs transcodes every chunk instead
    * of pruning with a guessed geometry (readStats sentinel contract).
    */
  def searchTermsSince(terms: Seq[String], k: Int, sinceDocId: Long,
                       mode: Mode = Or, useWand: Boolean = true): Seq[Bm25.Hit] = {
    val (n, avgdl) = corpusStats
    val boundary = if (chunkDocsConf > 0) sinceDocId / chunkDocsConf else -1L
    val postsAll = postings.filter($"term".isin(terms: _*))
    val posts =
      if (boundary >= 0) postsAll.filter($"chunk" >= boundary) else postsAll

    val dfMap = globalDf(terms)
    if (mode == And && terms.exists(t => !dfMap.contains(t))) return Seq.empty
    if (dfMap.isEmpty) return Seq.empty
    val idfMap = dfMap.map { case (t, df) => t -> Bm25.idf(n, df) }

    val idfB = spark.sparkContext.broadcast(idfMap)
    val conj = mode == And
    val wand = useWand
    val needTerms = terms.distinct.size
    val mark = sinceDocId
    val bnd = boundary

    def score(termLists: Seq[Bm25.TermList], docLen: Bm25.DocLen): Iterator[Bm25.Hit] =
      if (termLists.isEmpty || (conj && termLists.size != needTerms)) Iterator.empty
      else (if (conj) Bm25.scoreConjunctive(termLists, docLen, avgdl, k)
            else if (wand) Bm25.scoreWand(termLists, docLen, avgdl, k)
            else Bm25.scoreExhaustive(termLists, docLen, avgdl, k)).iterator

    // strictly-above-boundary chunks are entirely fresh: lists pass
    // through untouched; the boundary (or every chunk, legacy) pays one
    // decode-filter-reencode of the query terms' lists only
    def toLists(chunk: Long,
                ps: Iterator[graft.index.PostingRow]): Seq[Bm25.TermList] =
      ps.flatMap { p =>
        if (bnd >= 0 && chunk > bnd)
          Some(Bm25.TermList(p.term, idfB.value(p.term),
            p.blocks.map(_.maxTf).max, p.df, p.blocks, p.postingsBlob))
        else {
          val kept = graft.codec.PostingCodec.decode(p.df, p.postingsBlob)
            .filter(_._1 > mark)
          if (kept.isEmpty) None
          else {
            val (df2, _, blocks2, blob2) =
              graft.codec.PostingCodec.encode(
                scala.collection.immutable.ArraySeq.unsafeWrapArray(kept))
            Some(Bm25.TermList(p.term, idfB.value(p.term),
              blocks2.map(_.maxTf).max, df2, blocks2, blob2))
          }
        }
      }.toSeq

    val perChunk = lensBroadcast match {
      case Some(bc) =>
        posts.groupByKey(_.chunk).flatMapGroups { (chunk, ps) =>
          bc.value.get(chunk) match {
            case None => Iterator.empty
            case Some(lens) => score(toLists(chunk, ps), id => lens.get(id))
          }
        }.collect()
      case None =>
        val qualifying = (if (mode == And)
            posts.groupBy($"chunk").agg(countDistinct($"term").as("nt"))
              .filter($"nt" === needTerms)
          else posts.select($"chunk").distinct()
        ).select($"chunk").as[Long].collect()
        if (qualifying.isEmpty) return Seq.empty
        val postsQ = posts.filter($"chunk".isin(qualifying: _*))
        val docsQ = docs.filter($"chunk".isin(qualifying: _*))
          .select($"chunk", $"docId", $"docLength")
          .as[(Long, Long, Long)]
        postsQ.groupByKey(_.chunk)
          .cogroup(docsQ.groupByKey(_._1)) { (chunk, ps, ds) =>
            val lens = new java.util.HashMap[java.lang.Long, java.lang.Double]()
            ds.foreach { case (_, docId, len) => lens.put(docId, len.toDouble) }
            if (lens.isEmpty) Iterator.empty
            else score(toLists(chunk, ps), id => lens.get(id))
          }
          .collect()
    }
    perChunk.sorted(Bm25.better.reverse).take(k).toSeq
  }

  /** More-like-this retrieval (the Elasticsearch MLT operator — "find
    * documents like this one"): the seed document's top-`kTerms` TF-IDF
    * keywords become an OR query, the seed itself is excluded from the
    * hits. Keyword selection is the EXACT `TextAnalysis.keywordsTfIdf`
    * rule — tfidf = round(tf · ln(N/df), 6), ties term-ascending — but
    * computed engine-side at query cost: tf from tokenizing the ONE
    * seed text driver-side (frozen body rules), df from the memoized
    * index-dictionary probe (term-pushdown — no corpus scan), N from
    * persisted stats. Terms absent from the index contribute nothing.
    */
  def moreLikeThis(seedDocId: Long, seedText: String, kTerms: Int = 5,
                   k: Int = GraftConfig.TopK): Seq[Bm25.Hit] = {
    require(kTerms > 0, "kTerms must be positive")
    val tf = graft.tokenizer.Tokenizer.bodyTokens(seedText)
      .groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    if (tf.isEmpty) return Seq.empty
    val dfMap = globalDf(tf.keys.toSeq.sorted)
    val n = corpusStats._1
    val selected = tf.toSeq
      .flatMap { case (t, f) =>
        dfMap.get(t).map { df =>
          val w = BigDecimal(f.toDouble * math.log(n.toDouble / df.toDouble))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (t, w)
        }
      }
      .sortBy { case (t, w) => (-w, t) }
      .take(kTerms).map(_._1)
    if (selected.isEmpty) Seq.empty
    else searchTerms(selected, k + 1, Or).filter(_.docId != seedDocId).take(k)
  }

  /** Positional phrase BM25 top-k: the phrase is scored as ONE virtual
    * term whose per-doc tf is the consecutive-run count
    * ([[Bm25.phraseTfs]] — the ISRPhrase semantics on docId+position
    * space) and whose df is the global count of docs with >= 1 match.
    * Two pushed-filter jobs over the phrase terms' lists only: chunk
    * df counts (summed driver-side; docIds are chunk-disjoint), then
    * per-chunk scoring. All-or-nothing per chunk: a chunk missing any
    * phrase term cannot match.
    */
  def searchPhrase(phrase: Seq[String], k: Int): Seq[Bm25.Hit] = {
    val (n, avgdl) = corpusStats
    if (phrase.isEmpty || n == 0L) return Seq.empty
    val posts = postings.filter($"term".isin(phrase.distinct: _*))
    val ph = phrase
    val need = phrase.distinct.size

    def chunkLists(ps: Iterator[graft.index.PostingRow]): Option[Seq[(Long, Array[Byte])]] = {
      val m = ps.map(p => p.term -> ((p.df, p.postingsBlob))).toMap
      if (m.size < need) None else Some(ph.map(m(_)))
    }

    // job 1: global phrase df (per-chunk match counts, tiny rows)
    val dfPhrase = posts.groupByKey(_.chunk).mapGroups { (_, ps) =>
      chunkLists(ps).map(ls => Bm25.phraseTfs(ls).size.toLong).getOrElse(0L)
    }.collect().sum
    if (dfPhrase == 0L) return Seq.empty
    val idf = Bm25.idf(n, dfPhrase)

    // job 2: per-chunk BM25 of the virtual phrase term
    def score(ls: Seq[(Long, Array[Byte])], docLen: Bm25.DocLen): Iterator[Bm25.Hit] = {
      val top = new Bm25.TopK(k)
      Bm25.phraseTfs(ls).forEach { (id, tf) =>
        top.offer(Bm25.Hit(id, idf * Bm25.tfPart(tf.toDouble, docLen(id), avgdl)))
      }
      top.result().iterator
    }
    val perChunk = lensBroadcast match {
      case Some(bc) =>
        posts.groupByKey(_.chunk).flatMapGroups { (chunk, ps) =>
          (bc.value.get(chunk), chunkLists(ps)) match {
            case (Some(lens), Some(ls)) => score(ls, id => lens.get(id))
            case _ => Iterator.empty
          }
        }.collect()
      case None =>
        val qualifying = posts.select($"chunk").distinct().as[Long].collect()
        if (qualifying.isEmpty) return Seq.empty
        val postsQ = posts.filter($"chunk".isin(qualifying: _*))
        val docsQ = docs.filter($"chunk".isin(qualifying: _*))
          .select($"chunk", $"docId", $"docLength")
          .as[(Long, Long, Long)]
        postsQ.groupByKey(_.chunk)
          .cogroup(docsQ.groupByKey(_._1)) { (_, ps, ds) =>
            val lens = new java.util.HashMap[java.lang.Long, java.lang.Double]()
            ds.foreach { case (_, id, len) => lens.put(id, len.toDouble) }
            chunkLists(ps) match {
              case Some(ls) if !lens.isEmpty => score(ls, id => lens.get(id))
              case _ => Iterator.empty
            }
          }.collect()
    }
    perChunk.sorted(Bm25.better.reverse).take(k).toSeq
  }

  /** Proximity-weighted BM25 top-k ([[Bm25.scoreProximity]]): exhaustive
    * BM25 plus windowed occurrence-pair proximity per query-term pair —
    * positions are already in the posting blobs, so the plan is
    * byte-for-byte the plain BM25 scan (term-pushed, chunk kernels, same
    * lens broadcast/cogroup gate); only the kernel changes. Deterministic
    * (score desc, docId asc); term-pair iteration order pinned to the
    * query order.
    */
  def searchTermsProximity(terms: Seq[String], k: Int,
                           window: Int = 5): Seq[Bm25.Hit] = {
    val (n, avgdl) = corpusStats
    val base = terms.distinct
    if (base.isEmpty || n == 0L) return Seq.empty
    val posts = postings.filter($"term".isin(base: _*))
    val dfMap = globalDf(base)
    if (dfMap.isEmpty) return Seq.empty
    val idfMap = dfMap.map { case (t, df) => t -> Bm25.idf(n, df) }
    val idfB = spark.sparkContext.broadcast(idfMap)
    val orderB = spark.sparkContext.broadcast(base.zipWithIndex.toMap)
    val w = window
    val kk = k

    def toLists(ps: Iterator[graft.index.PostingRow]): Seq[Bm25.TermList] =
      ps.filter(p => idfB.value.contains(p.term)).map { p =>
        Bm25.TermList(p.term, idfB.value(p.term),
          p.blocks.map(_.maxTf).max, p.df, p.blocks, p.postingsBlob)
      }.toSeq.sortBy(p => orderB.value(p.term))

    val perChunk = lensBroadcast match {
      case Some(bc) =>
        posts.groupByKey(_.chunk).flatMapGroups { (chunk, ps) =>
          bc.value.get(chunk) match {
            case None => Iterator.empty
            case Some(lens) =>
              val lists = toLists(ps)
              if (lists.isEmpty) Iterator.empty
              else Bm25.scoreProximity(lists, id => lens.get(id), avgdl, kk, w).iterator
          }
        }.collect()
      case None =>
        val qualifying = posts.select($"chunk").distinct().as[Long].collect()
        if (qualifying.isEmpty) return Seq.empty
        val postsQ = posts.filter($"chunk".isin(qualifying: _*))
        val docsQ = docs.filter($"chunk".isin(qualifying: _*))
          .select($"chunk", $"docId", $"docLength")
          .as[(Long, Long, Long)]
        postsQ.groupByKey(_.chunk)
          .cogroup(docsQ.groupByKey(_._1)) { (_, ps, ds) =>
            val lens = new java.util.HashMap[java.lang.Long, java.lang.Double]()
            ds.foreach { case (_, id, len) => lens.put(id, len.toDouble) }
            val lists = toLists(ps)
            if (lens.isEmpty || lists.isEmpty) Iterator.empty
            else Bm25.scoreProximity(lists, id => lens.get(id), avgdl, kk, w).iterator
          }.collect()
    }
    perChunk.sorted(Bm25.better.reverse).take(k).toSeq
  }

  /** Champion-list top-k (static index pruning, IIR §7.1.3 / the
    * impact-ordered-index family): stage 1 selects each query term's
    * global top-`m` documents by (tf desc, docId asc) — a per-posting-row
    * selection emitting <= m rows per (chunk, term), merged to a global
    * prefix on the driver (valid because the per-doc statistic makes the
    * global top-m a subset of the union of per-chunk top-m); stage 2
    * scores ONLY the candidate union with full BM25 over every query
    * term, probing each candidate via block-skip cursor seeks in its own
    * (partition-pruned) chunk. Approximate by construction: a doc outside
    * every term's champion list cannot surface — the classic
    * quality/latency trade for stopword-heavy queries, where scoring all
    * of a high-df term's postings is the cost driver. Deterministic
    * (score desc, docId asc).
    */
  /** Champion stage 1, shared by the plain/fielded/proximity champion
    * rankers: the per-term global top-`m` docIds by BODY (tf desc,
    * docId asc) — from the persisted sidecar when one covers the
    * request (prefix reads + a distributed per-term window, driver
    * collect <= |terms|·m ids), inline per-blob decode otherwise (no
    * sidecar, or m exceeds the built prefix depth). `posts` must be the
    * body-term-pushed posting scan for `base`.
    */
  private def championCandidates(posts: org.apache.spark.sql.Dataset[graft.index.PostingRow],
                                 base: Seq[String], m: Int): Array[Long] = {
    val mm = m
    championMeta.flatMap(meta =>
      graft.index.ChampionSidecar.candidateIdsWithMeta(
        spark, indexDir, base, mm, meta)).getOrElse {
      // inline recompute: per-(chunk, term) prefixes from the blobs,
      // then the per-term GLOBAL top-m as a distributed window — the
      // driver collects <= |terms|·m ids, never the chunk×term union
      import org.apache.spark.sql.expressions.Window
      posts.flatMap { p =>
        graft.codec.PostingCodec.decode(p.df, p.postingsBlob).iterator
          .map { case (docId, poss) => (p.term, docId, poss.length.toLong) }
          .toArray
          .sortBy { case (_, id, tf) => (-tf, id) }
          .take(mm).iterator
      }.toDF("term", "doc_id", "tf")
        .withColumn("grank", row_number().over(
          Window.partitionBy($"term").orderBy(desc("tf"), asc("doc_id"))))
        .filter($"grank" <= mm)
        .select($"doc_id").distinct()
        .as[Long].collect().sorted
    }
  }

  def searchTermsChampion(terms: Seq[String], k: Int, m: Int = 64): Seq[Bm25.Hit] = {
    val (n, avgdl) = corpusStats
    val base = terms.distinct
    if (base.isEmpty || n == 0L || m <= 0) return Seq.empty
    val posts = postings.filter($"term".isin(base: _*))
    val candidates = championCandidates(posts, base, m)
    if (candidates.isEmpty) return Seq.empty

    // stage 2: full BM25 over the candidate set only
    val dfMap = globalDf(base)
    if (dfMap.isEmpty) return Seq.empty
    val idfMap = dfMap.map { case (t, df) => t -> Bm25.idf(n, df) }
    val idfB = spark.sparkContext.broadcast(idfMap)
    val candByChunk: Map[Long, Array[Long]] =
      if (chunkDocsConf > 0) candidates.groupBy(_ / chunkDocsConf)
      else Map(-1L -> candidates) // legacy stats: no chunk derivation
    val candB = spark.sparkContext.broadcast(candByChunk)
    val postsQ =
      if (chunkDocsConf > 0)
        posts.filter($"chunk".isin(candByChunk.keys.toSeq: _*))
      else posts

    def score(chunk: Long, termLists: Seq[Bm25.TermList],
              docLen: Bm25.DocLen): Iterator[Bm25.Hit] = {
      val cands = candB.value.getOrElse(
        if (candB.value.contains(chunk)) chunk else -1L, Array.empty[Long])
      if (termLists.isEmpty || cands.isEmpty) Iterator.empty
      else Bm25.scoreCandidates(termLists, docLen, avgdl, cands, k).iterator
    }
    def toLists(ps: Iterator[graft.index.PostingRow]): Seq[Bm25.TermList] =
      ps.filter(p => idfB.value.contains(p.term)).map { p =>
        Bm25.TermList(p.term, idfB.value(p.term),
          p.blocks.map(_.maxTf).max, p.df, p.blocks, p.postingsBlob)
      }.toSeq

    val hits = lensBroadcast match {
      case Some(bc) =>
        postsQ.groupByKey(_.chunk).flatMapGroups { (chunk, ps) =>
          bc.value.get(chunk) match {
            case None => Iterator.empty
            case Some(lens) => score(chunk, toLists(ps), id => lens.get(id))
          }
        }.collect()
      case None =>
        val qualifying = postsQ.select($"chunk").distinct().as[Long].collect()
        if (qualifying.isEmpty) return Seq.empty
        val docsQ = docs.filter($"chunk".isin(qualifying: _*))
          .select($"chunk", $"docId", $"docLength")
          .as[(Long, Long, Long)]
        postsQ.filter($"chunk".isin(qualifying: _*)).groupByKey(_.chunk)
          .cogroup(docsQ.groupByKey(_._1)) { (chunk, ps, ds) =>
            val lens = new java.util.HashMap[java.lang.Long, java.lang.Double]()
            ds.foreach { case (_, id, len) => lens.put(id, len.toDouble) }
            if (lens.isEmpty) Iterator.empty
            else score(chunk, toLists(ps), id => lens.get(id))
          }.collect()
    }
    hits.sorted(Bm25.better.reverse).take(k).toSeq
  }

  /** Champion-accelerated BM25F ([[searchTermsFielded]]'s stage-2 twin
    * of [[searchTermsChampion]]): stage 1 selects the per-term global
    * top-`m` candidates by BODY tf — shared [[championCandidates]], so
    * the persisted sidecar serves this ranker too — and stage 2 scores
    * ONLY the candidates with the full field-weighted model (idf from
    * the un-restricted body∪title union df, now counted by block-skip
    * leapfrog instead of a full decode; both field cursors seek the
    * candidate list). Approximate by construction like every champion
    * ranker — candidates are BODY-routed, so a doc matching only in its
    * TITLE cannot surface — and float-identical to the exhaustive
    * fielded ranker restricted to the candidate set (q_bm25f_champion
    * pins it against that exact SQL).
    */
  def searchTermsFieldedChampion(terms: Seq[String], k: Int, m: Int = 64,
                                 wBody: Double = 1.0,
                                 wTitle: Double = 2.5): Seq[Bm25.Hit] = {
    val (n, _) = corpusStats
    val base = terms.distinct
    if (base.isEmpty || n == 0L || m <= 0) return Seq.empty
    val candidates =
      championCandidates(postings.filter($"term".isin(base: _*)), base, m)
    if (candidates.isEmpty) return Seq.empty

    val all = base ++ base.map("#" + _)
    val posts = postings.filter($"term".isin(all: _*))

    type FieldEntry = (Long, Array[graft.codec.PostingBlock], Array[Byte])
    def splitCursors(ps: Iterator[graft.index.PostingRow])
        : Map[String, (Option[FieldEntry], Option[FieldEntry])] =
      ps.foldLeft(Map.empty[String, (Option[FieldEntry], Option[FieldEntry])]) {
        (acc, p) =>
          val (t, isTitle) =
            if (p.term.startsWith("#")) (p.term.substring(1), true)
            else (p.term, false)
          val (b, ti) = acc.getOrElse(t, (None, None))
          val entry = Some((p.df, p.blocks, p.postingsBlob))
          acc.updated(t, if (isTitle) (b, entry) else (entry, ti))
      }

    // idf from the SAME un-restricted union df as the exhaustive fielded
    // ranker (global statistics never candidate-restrict) — per-chunk
    // leapfrog counts summed driver-side, no full decode
    val dfU: Map[String, Long] = posts
      .groupByKey(_.chunk)
      .flatMapGroups { (_, ps) =>
        splitCursors(ps).iterator.map { case (t, (b, ti)) =>
          (t, Bm25.unionDfSkip(b, ti))
        }
      }.collect().groupBy(_._1).map { case (t, arr) => t -> arr.map(_._2).sum }
      .filter(_._2 > 0L)
    if (dfU.isEmpty) return Seq.empty
    val idfMap = dfU.map { case (t, df) => t -> Bm25.idf(n, df) }
    val idfB = spark.sparkContext.broadcast(idfMap)
    val (avgB, avgT) = fieldStats
    val kk = k
    val (wb, wt) = (wBody, wTitle)

    val candByChunk: Map[Long, Array[Long]] =
      if (chunkDocsConf > 0) candidates.groupBy(_ / chunkDocsConf)
      else Map(-1L -> candidates)
    val candB = spark.sparkContext.broadcast(candByChunk)
    val postsQ =
      if (chunkDocsConf > 0)
        posts.filter($"chunk".isin(candByChunk.keys.toSeq: _*))
      else posts

    def score(chunk: Long,
              fields: Map[String, (Option[FieldEntry], Option[FieldEntry])],
              dlB: Bm25.DocLen, dlT: Bm25.DocLen): Iterator[Bm25.Hit] = {
      val cands = candB.value.getOrElse(
        if (candB.value.contains(chunk)) chunk else -1L, Array.empty[Long])
      val lists = fields.iterator.collect {
        case (t, (b, ti)) if idfB.value.contains(t) =>
          Bm25.FieldCursorLists(t, idfB.value(t), b, ti)
      }.toSeq
      if (lists.isEmpty || cands.isEmpty) Iterator.empty
      else Bm25.scoreBm25FCandidates(lists, dlB, dlT, avgB, avgT,
        wb, wt, cands, kk).iterator
    }

    val hits = fieldedLensBroadcast match {
      case Some(bc) =>
        postsQ.groupByKey(_.chunk).flatMapGroups { (chunk, ps) =>
          bc.value.get(chunk) match {
            case None => Iterator.empty
            case Some(lens) =>
              score(chunk, splitCursors(ps),
                id => lens.get(id)(0), id => lens.get(id)(1))
          }
        }.collect()
      case None =>
        val qualifying = postsQ.select($"chunk").distinct().as[Long].collect()
        if (qualifying.isEmpty) return Seq.empty
        val docsQ = docs.filter($"chunk".isin(qualifying: _*))
          .select($"chunk", $"docId", $"docLength", $"numTitleWords")
          .as[(Long, Long, Long, Long)]
        postsQ.filter($"chunk".isin(qualifying: _*)).groupByKey(_.chunk)
          .cogroup(docsQ.groupByKey(_._1)) { (chunk, ps, ds) =>
            val lens = new java.util.HashMap[java.lang.Long, Array[Double]]()
            ds.foreach { case (_, id, dl, tw) =>
              lens.put(id, Array(math.max(dl - tw, 0L).toDouble, tw.toDouble))
            }
            if (lens.isEmpty) Iterator.empty
            else score(chunk, splitCursors(ps),
              id => lens.get(id)(0), id => lens.get(id)(1))
          }.collect()
    }
    hits.sorted(Bm25.better.reverse).take(k).toSeq
  }

  /** Champion-accelerated proximity BM25 ([[searchTermsProximity]]'s
    * stage-2 twin of [[searchTermsChampion]]): stage 1 = the shared
    * BODY-champion candidates (sidecar-served when present); stage 2
    * runs the proximity kernel with per-list cursor seeks collecting
    * only the candidates' position arrays — the windowed pair walk then
    * sees exactly the exhaustive kernel's per-doc inputs, and per-doc
    * independence + exact integer micro-accumulation make the result
    * equal to [[searchTermsProximity]] restricted to the candidates
    * (q_bm25_prox_champion pins it against that exact SQL).
    */
  def searchTermsProximityChampion(terms: Seq[String], k: Int, m: Int = 64,
                                   window: Int = 5): Seq[Bm25.Hit] = {
    val (n, avgdl) = corpusStats
    val base = terms.distinct
    if (base.isEmpty || n == 0L || m <= 0) return Seq.empty
    val posts = postings.filter($"term".isin(base: _*))
    val candidates = championCandidates(posts, base, m)
    if (candidates.isEmpty) return Seq.empty
    val dfMap = globalDf(base)
    if (dfMap.isEmpty) return Seq.empty
    val idfMap = dfMap.map { case (t, df) => t -> Bm25.idf(n, df) }
    val idfB = spark.sparkContext.broadcast(idfMap)
    val orderB = spark.sparkContext.broadcast(base.zipWithIndex.toMap)
    val w = window
    val kk = k

    val candByChunk: Map[Long, Array[Long]] =
      if (chunkDocsConf > 0) candidates.groupBy(_ / chunkDocsConf)
      else Map(-1L -> candidates)
    val candB = spark.sparkContext.broadcast(candByChunk)
    val postsQ =
      if (chunkDocsConf > 0)
        posts.filter($"chunk".isin(candByChunk.keys.toSeq: _*))
      else posts

    def toLists(ps: Iterator[graft.index.PostingRow]): Seq[Bm25.TermList] =
      ps.filter(p => idfB.value.contains(p.term)).map { p =>
        Bm25.TermList(p.term, idfB.value(p.term),
          p.blocks.map(_.maxTf).max, p.df, p.blocks, p.postingsBlob)
      }.toSeq.sortBy(p => orderB.value(p.term))

    def score(chunk: Long, lists: Seq[Bm25.TermList],
              docLen: Bm25.DocLen): Iterator[Bm25.Hit] = {
      val cands = candB.value.getOrElse(
        if (candB.value.contains(chunk)) chunk else -1L, Array.empty[Long])
      if (lists.isEmpty || cands.isEmpty) Iterator.empty
      else Bm25.scoreProximityCandidates(lists, docLen, avgdl, cands, kk, w)
        .iterator
    }

    val hits = lensBroadcast match {
      case Some(bc) =>
        postsQ.groupByKey(_.chunk).flatMapGroups { (chunk, ps) =>
          bc.value.get(chunk) match {
            case None => Iterator.empty
            case Some(lens) => score(chunk, toLists(ps), id => lens.get(id))
          }
        }.collect()
      case None =>
        val qualifying = postsQ.select($"chunk").distinct().as[Long].collect()
        if (qualifying.isEmpty) return Seq.empty
        val docsQ = docs.filter($"chunk".isin(qualifying: _*))
          .select($"chunk", $"docId", $"docLength")
          .as[(Long, Long, Long)]
        postsQ.filter($"chunk".isin(qualifying: _*)).groupByKey(_.chunk)
          .cogroup(docsQ.groupByKey(_._1)) { (chunk, ps, ds) =>
            val lens = new java.util.HashMap[java.lang.Long, java.lang.Double]()
            ds.foreach { case (_, id, len) => lens.put(id, len.toDouble) }
            if (lens.isEmpty) Iterator.empty
            else score(chunk, toLists(ps), id => lens.get(id))
          }.collect()
    }
    hits.sorted(Bm25.better.reverse).take(k).toSeq
  }

  /** BM25 score EXPLANATION — the DebugScore instrument of the reference
    * ranker (ranker/ranker.h:162-215's per-component breakdown) applied
    * to the probabilistic scorer: for each of the final top-k docs, one
    * row per matching query term with (tf, df, idf, tfPart,
    * contribution = idf·tfPart) plus the doc's total — the "explain"
    * every relevance investigation starts from; contributions sum to the
    * score exactly (same Bm25.idf/tfPart the kernels use).
    *
    * Cost: one ordinary [[searchTerms]] plus a CHUNK-PRUNED forward
    * extraction of the ≤ k hit docs' tfs from the posting blobs (the PRF
    * pattern — ≤ k docs live in ≤ k chunks, so the decode is hit-sized,
    * never corpus-sized) and one ≤ k-row length resolve.
    */
  def searchTermsExplain(terms: Seq[String], k: Int): Seq[Bm25ExplainRow] = {
    val base = terms.distinct
    val hits = searchTerms(base, k, Or)
    if (hits.isEmpty) return Seq.empty
    val (n, avgdl) = corpusStats
    val dfMap = globalDf(base)
    val idfMap = dfMap.map { case (t, df) => t -> Bm25.idf(n, df) }
    val ids = hits.map(_.docId)
    val idB = spark.sparkContext.broadcast(ids.toSet)
    val posts =
      if (chunkDocsConf > 0) {
        val cs = ids.map(_ / chunkDocsConf).distinct
        postings.filter($"chunk".isin(cs: _*) && $"term".isin(base: _*))
      } else postings.filter($"term".isin(base: _*))
    val tfs: Map[(Long, String), Long] = posts.flatMap { p =>
      graft.codec.PostingCodec.decode(p.df, p.postingsBlob).toSeq
        .filter { case (id, _) => idB.value.contains(id) }
        .map { case (id, ps) => (id, p.term, ps.length.toLong) }
    }.collect().map { case (id, t, tf) => (id, t) -> tf }.toMap
    val lens: Map[Long, Long] = {
      val pruned =
        if (chunkDocsConf > 0) {
          val cs = ids.map(_ / chunkDocsConf).distinct
          docs.filter($"chunk".isin(cs: _*) && $"docId".isin(ids: _*))
        } else docs.filter($"docId".isin(ids: _*))
      pruned.select($"docId", $"docLength").as[(Long, Long)].collect().toMap
    }
    val ordered = base.sorted
    hits.flatMap { h =>
      ordered.flatMap { t =>
        tfs.get((h.docId, t)).map { tf =>
          val tp = Bm25.tfPart(tf.toDouble, lens(h.docId).toDouble, avgdl)
          Bm25ExplainRow(h.docId, t, tf, dfMap(t), idfMap(t), tp,
            idfMap(t) * tp, h.score)
        }
      }
    }
  }

  /** Core: returns global top-k (docId, score), deterministic order
    * (score desc, docId asc).
    */
  def searchTerms(terms: Seq[String], k: Int, mode: Mode = Or,
                  useWand: Boolean = true): Seq[Bm25.Hit] = {
    val (n, avgdl) = corpusStats
    val dfMap = globalDf(terms)
    if (mode == And && terms.exists(t => !dfMap.contains(t))) return Seq.empty
    if (dfMap.isEmpty) return Seq.empty
    val idfMap = dfMap.map { case (t, df) => t -> Bm25.idf(n, df) }
    searchTermsWithStats(terms, k, idfMap, avgdl, mode, useWand)
  }

  /** The scoring phase of [[searchTerms]] with the collection statistics
    * (per-term idf, avgdl) supplied by the caller instead of derived from
    * THIS index — the hook [[FederatedBm25]] scores each shard through so
    * every shard ranks against the same GLOBAL statistics (the classic
    * distributed-IR df-exchange; the reference's per-machine indexes
    * skip it and each server ranks against local stats,
    * frontEnd/communicationServer.h:118-130). Terms absent from idfMap
    * contribute nothing (df 0 ⇒ no posting rows); conjunctive chunks
    * still require every REQUESTED term locally.
    */
  private[engine] def searchTermsWithStats(terms: Seq[String], k: Int,
      idfMap: Map[String, Double], avgdl: Double, mode: Mode,
      useWand: Boolean): Seq[Bm25.Hit] = {
    val posts = postings.filter($"term".isin(terms: _*))
    val idfB = spark.sparkContext.broadcast(idfMap)
    val conj = mode == And
    val wand = useWand
    val needTerms = terms.distinct.size

    def score(termLists: Seq[Bm25.TermList], docLen: Bm25.DocLen): Iterator[Bm25.Hit] =
      if (termLists.isEmpty || (conj && termLists.size != needTerms)) Iterator.empty
      else (if (conj) Bm25.scoreConjunctive(termLists, docLen, avgdl, k)
            else if (wand) Bm25.scoreWand(termLists, docLen, avgdl, k)
            else Bm25.scoreExhaustive(termLists, docLen, avgdl, k)).iterator

    def toLists(ps: Iterator[graft.index.PostingRow]): Seq[Bm25.TermList] =
      ps.map { p =>
        Bm25.TermList(p.term, idfB.value(p.term),
          p.blocks.map(_.maxTf).max, p.df, p.blocks, p.postingsBlob)
      }.toSeq

    val perChunk = lensBroadcast match {
      case Some(bc) =>
        // ONE job: conjunctive chunk-disqualification happens in score()
        posts.groupByKey(_.chunk).flatMapGroups { (chunk, ps) =>
          bc.value.get(chunk) match {
            case None => Iterator.empty
            case Some(lens) => score(toLists(ps), id => lens.get(id))
          }
        }.collect()
      case None =>
        // big-index path: prune chunks, cogroup only their doc lengths.
        // A Bloom sidecar (if built) supplies the candidate list first —
        // partition-level pruning with no false negatives, so the
        // qualifying set (and every score) is unchanged; AND mode needs
        // all terms per chunk, OR mode any.
        val bloomCand =
          if (bloomAvailable)
            graft.index.BloomSidecar.candidateChunks(spark, indexDir,
              idfMap.keys.toSeq, requireAll = mode == And)
          else None
        if (bloomCand.exists(_.isEmpty)) return Seq.empty
        val postsB = bloomCand match {
          case Some(cs) => posts.filter($"chunk".isin(cs.toSeq: _*))
          case None => posts
        }
        val qualifying = (if (conj)
            postsB.groupBy($"chunk").agg(countDistinct($"term").as("nt"))
              .filter($"nt" === needTerms)
          else postsB.select($"chunk").distinct()
        ).select($"chunk").as[Long].collect()
        if (qualifying.isEmpty) return Seq.empty
        val postsQ = postsB.filter($"chunk".isin(qualifying: _*))
        val docsQ = docs.filter($"chunk".isin(qualifying: _*))
          .select($"chunk", $"docId", $"docLength")
          .as[(Long, Long, Long)]
        postsQ.groupByKey(_.chunk)
          .cogroup(docsQ.groupByKey(_._1)) { (chunk, ps, ds) =>
            val lens = new java.util.HashMap[java.lang.Long, java.lang.Double]()
            ds.foreach { case (_, docId, len) => lens.put(docId, len.toDouble) }
            if (lens.isEmpty) Iterator.empty
            else score(toLists(ps), id => lens.get(id))
          }
          .collect()
    }

    perChunk.sorted(Bm25.better.reverse).take(k).toSeq
  }
}

object Bm25Engine {
  /** Retrieval mode shared across engine instances (see the class-level
    * aliases): Or = disjunctive WAND, And = conjunctive leapfrog.
    */
  sealed trait Mode
  case object Or extends Mode
  case object And extends Mode
}
