package graft.oracle

import graft.config.GraftConfig
import graft.corpus.Corpus
import graft.index.IdDoc
import graft.query.QueryParser
import graft.rank.{ChunkContext, DebugScore, DocScore, RankDoc, RefRanker}
import graft.tokenizer.Tokenizer

/** Single-threaded golden-path implementation (SURVEY.md §5.3): tokenize
  * -> in-memory chunked index -> RefRanker, with no Spark, no codec, no
  * Aggregator. The Spark engine must be rank-identical to this on the
  * frozen query set; agreement validates the whole distributed pipeline
  * (tokenize, typed aggregation, delta+varint encode, persistence, chunk
  * pruning, cogroup kernel, merge) since only the tokenizer and ranker
  * objects are shared.
  */
object RefOracle {

  /** Build the per-chunk context directly from the docs, restricted to
    * `terms` (and their '#' variants) like a real query would be.
    */
  def chunkContexts(docs: Seq[IdDoc], chunkDocs: Long,
                    terms: Seq[String]): Seq[ChunkContext] = {
    val wanted = (terms ++ terms.map("#" + _)).toSet
    docs.groupBy(d => d.docId / chunkDocs).toSeq.sortBy(_._1).map {
      case (chunk, chunkDocsSeq) =>
        val sorted = chunkDocsSeq.sortBy(_.docId)
        val termLocs = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
        val termDocs = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.HashSet[Long]]
        val endLocs = new Array[Long](sorted.length)
        val metas = new Array[RankDoc](sorted.length)
        var base = 0L
        var totalTokens = 0L
        sorted.zipWithIndex.foreach { case (d, i) =>
          val ps = Tokenizer.postings(d.path, d.content)
          ps.foreach { case (term, pos) =>
            if (wanted.contains(term)) {
              termLocs.getOrElseUpdate(term,
                new scala.collection.mutable.ArrayBuffer[Long]) += (base + pos)
              termDocs.getOrElseUpdate(term,
                new scala.collection.mutable.HashSet[Long]) += d.docId
            }
          }
          val docLength = ps.length.toLong
          totalTokens += docLength
          endLocs(i) = base + docLength + 1
          base = endLocs(i)
          metas(i) = RankDoc(d.docId, Corpus.url(d.repo, d.path, d.commit),
            Tokenizer.titleString(d.path), Tokenizer.abstractString(d.content),
            Tokenizer.titleWordsRaw(d.path).length.toLong, docLength)
        }
        new ChunkContext(chunk,
          termLocs.view.mapValues(_.toArray).toMap,
          termLocs.view.mapValues(_.length.toLong).toMap,
          termDocs.view.mapValues(_.size.toLong).toMap,
          endLocs, metas, totalTokens + sorted.length, chunkDocs)
    }
  }

  /** Golden per-candidate DebugScore breakdown (ranker.h:162-215) —
    * single-threaded counterpart of SearchEngine.searchDebug; ordered
    * (chunk, docId).
    */
  def searchDebug(docs: Seq[IdDoc], query: String,
                  chunkDocs: Long = GraftConfig.ChunkDocs): Seq[(Long, DebugScore)] = {
    val (astOpt, flat) = QueryParser.parseQuery(query)
    astOpt match {
      case None => Seq.empty
      case Some(ast) =>
        chunkContexts(docs, chunkDocs, flat.distinct).flatMap { ctx =>
          RefRanker.debugScores(ast, flat, ctx).map(d => (ctx.chunk, d))
        }
    }
  }

  /** End-to-end golden search over an in-memory corpus. */
  def search(docs: Seq[IdDoc], query: String,
             chunkDocs: Long = GraftConfig.ChunkDocs,
             topK: Int = GraftConfig.TopK): Seq[DocScore] = {
    val (astOpt, flat) = QueryParser.parseQuery(query)
    astOpt match {
      case None => Seq.empty
      case Some(ast) =>
        val ctxs = chunkContexts(docs, chunkDocs, flat.distinct)
        val perChunk = ctxs.map(ctx => (ctx.chunk, RefRanker.rankChunk(ast, flat, ctx, topK)))
        RefRanker.mergeChunkResults(perChunk, topK).filter(_.url.nonEmpty).toSeq
    }
  }
}
