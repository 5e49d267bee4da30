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
class Bm25Engine(spark: SparkSession, indexDir: String, cache: Boolean = true) {
  import spark.implicits._

  private val postings = {
    val p = IndexStore.readPostings(spark, indexDir)
    if (cache) p.cache() else p
  }
  private val docs = {
    val d = IndexStore.readDocs(spark, indexDir)
    if (cache) d.cache() else d
  }

  /** (N, avgdl) over pure token lengths (title + body, no EndDoc). */
  lazy val corpusStats: (Long, Double) = {
    val row = IndexStore.readStats(spark, indexDir)
      .agg(sum($"numDocs"), sum($"totalTokens")).head()
    val n = row.getLong(0)
    (n, row.getLong(1).toDouble / n.toDouble)
  }

  sealed trait Mode
  case object Or extends Mode       // WAND path
  case object And extends Mode      // leapfrog intersection

  /** Tokenize the query with the frozen body-token rules, score top-k. */
  def search(query: String, k: Int = GraftConfig.TopK, mode: Mode = Or,
             useWand: Boolean = true): Seq[Bm25Hit] = {
    val terms = Tokenizer.bodyTokens(query).distinct.toSeq
    if (terms.isEmpty) return Seq.empty
    val hits = searchTerms(terms, k, mode, useWand)
    // resolve doc metadata for the final k docIds only (tiny broadcast join)
    val ids = hits.map(_.docId)
    val meta = docs.filter($"docId".isin(ids: _*))
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

    // global df per term (Catalyst aggregate, tiny result, broadcast)
    val dfMap = posts.groupBy($"term").agg(sum($"df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (mode == And && terms.exists(t => !dfMap.contains(t))) return Seq.empty
    if (dfMap.isEmpty) return Seq.empty
    val idfMap = dfMap.map { case (t, df) => t -> Bm25.idf(n, df) }

    // chunk pruning: AND needs every term present, OR any
    val qualifying = (mode match {
      case And =>
        posts.groupBy($"chunk").agg(countDistinct($"term").as("nt"))
          .filter($"nt" === terms.distinct.size)
      case Or => posts.select($"chunk").distinct()
    }).select($"chunk").as[Long].collect()
    if (qualifying.isEmpty) return Seq.empty

    val postsQ = posts.filter($"chunk".isin(qualifying: _*))
    val docsQ = docs.filter($"chunk".isin(qualifying: _*))
      .select($"chunk", $"docId", $"docLength")
      .as[(Long, Long, Long)]

    val idfB = spark.sparkContext.broadcast(idfMap)
    val conj = mode == And
    val wand = useWand
    val perChunk = postsQ.groupByKey(_.chunk)
      .cogroup(docsQ.groupByKey(_._1)) { (chunk, ps, ds) =>
        val lens = new java.util.HashMap[Long, Double]()
        ds.foreach { case (_, docId, len) => lens.put(docId, len.toDouble) }
        if (lens.isEmpty) Iterator.empty
        else {
          val termLists = ps.map { p =>
            Bm25.TermList(p.term, idfB.value(p.term),
              p.blocks.map(_.maxTf).max, p.df, p.blocks, p.postingsBlob)
          }.toSeq
          if (termLists.isEmpty) Iterator.empty
          else {
            val docLen: Bm25.DocLen = id => lens.get(id)
            val hits =
              if (conj) Bm25.scoreConjunctive(termLists, docLen, avgdl, k)
              else if (wand) Bm25.scoreWand(termLists, docLen, avgdl, k)
              else Bm25.scoreExhaustive(termLists, docLen, avgdl, k)
            hits.iterator
          }
        }
      }
      .collect()

    perChunk.sorted(Bm25.better.reverse).take(k).toSeq
  }
}
