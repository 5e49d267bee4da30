package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.index.IndexStore
import graft.rank.Bm25
import graft.tokenizer.Tokenizer

/** BM25 scored result. */
case class Bm25Hit(docId: Long, score: Double, url: String, title: String)

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

  /** One stats job: N, total token count, and the index's configured
    * docs-per-chunk (persisted by buildStats so docId -> chunk is
    * derivable for partition pruning).
    */
  private lazy val globalStats: (Long, Double, Long) = {
    val row = IndexStore.readStats(spark, indexDir)
      .agg(sum($"numDocs"), sum($"totalTokens"), max($"chunkDocs")).head()
    if (row.isNullAt(0)) (0L, 0.0, GraftConfig.ChunkDocs) // empty index
    else {
      val n = row.getLong(0)
      (n, row.getLong(1).toDouble / math.max(n, 1L).toDouble, row.getLong(2))
    }
  }

  /** (N, avgdl) over pure token lengths (title + body, no EndDoc). */
  lazy val corpusStats: (Long, Double) = (globalStats._1, globalStats._2)

  private def chunkDocsConf: Long = globalStats._3

  sealed trait Mode
  case object Or extends Mode       // WAND path
  case object And extends Mode      // leapfrog intersection

  /** Global-df memo. One engine serves concurrent queries (the
    * pthread-per-request analog, index/indexServer.cpp:178-198), so the
    * memo is a ConcurrentHashMap — a plain mutable map raced on resize
    * (Bm25Spec's concurrent-query smoke test pins this). A term may be
    * computed twice under contention; both writers store the same value.
    */
  private val dfCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

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
    val ids = hits.map(_.docId)
    val pruned =
      if (chunkDocsConf > 0) {
        val hitChunks = ids.map(_ / chunkDocsConf).distinct
        docs.filter($"chunk".isin(hitChunks: _*) && $"docId".isin(ids: _*))
      } else docs.filter($"docId".isin(ids: _*))
    val meta = pruned
      .select($"docId", $"url", $"title").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    hits.map(h => Bm25Hit(h.docId, h.score,
      meta.get(h.docId).map(_._1).getOrElse(""),
      meta.get(h.docId).map(_._2).getOrElse("")))
  }

  /** Core: returns global top-k (docId, score), deterministic order
    * (score desc, docId asc).
    */
  def searchTerms(terms: Seq[String], k: Int, mode: Mode = Or,
                  useWand: Boolean = true): Seq[Bm25.Hit] = {
    val (n, avgdl) = corpusStats
    val posts = postings.filter($"term".isin(terms: _*))

    // global df per term (Catalyst aggregate, tiny result), memoized per
    // engine so repeat queries pay no stats job
    val missing = terms.filterNot(dfCache.containsKey)
    if (missing.nonEmpty) {
      postings.filter($"term".isin(missing: _*))
        .groupBy($"term").agg(sum($"df").as("df"))
        .collect().foreach(r => dfCache.put(r.getString(0), r.getLong(1)))
      missing.foreach(t => dfCache.putIfAbsent(t, 0L))
    }
    val dfMap = terms
      .flatMap(t => Option(dfCache.get(t)).map(_.longValue).filter(_ > 0).map(t -> _))
      .toMap
    if (mode == And && terms.exists(t => !dfMap.contains(t))) return Seq.empty
    if (dfMap.isEmpty) return Seq.empty
    val idfMap = dfMap.map { case (t, df) => t -> Bm25.idf(n, df) }

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
              dfMap.keys.toSeq, requireAll = mode == And)
          else None
        if (bloomCand.exists(_.isEmpty)) return Seq.empty
        val postsB = bloomCand match {
          case Some(cs) => posts.filter($"chunk".isin(cs.toSeq: _*))
          case None => posts
        }
        val qualifying = (mode match {
          case And =>
            postsB.groupBy($"chunk").agg(countDistinct($"term").as("nt"))
              .filter($"nt" === needTerms)
          case Or => postsB.select($"chunk").distinct()
        }).select($"chunk").as[Long].collect()
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
