package graft.index

import graft.codec.PostingBlock

/** One row of the input table (BASELINE.json input_hint). */
case class SourceDoc(repo: String, path: String, commit: String,
                     lang: String, content: String)

/** SourceDoc with its assigned dense docId (FIXTURES.md §2). */
case class IdDoc(docId: Long, repo: String, path: String, commit: String,
                 lang: String, content: String)

/** Tokenizer output row (FIXTURES.md §3; isTitle is implied by the '#'
  * decoration on term, mirroring the reference's single dictionary,
  * ranker/ranker.h:742-745).
  */
case class Token(chunk: Long, term: String, docId: Long, pos: Long)

/** Map-side grouped posting fragment: every position of one (doc, term)
  * pair in ascending order — the shuffle row of the "grouped" build
  * strategy (IndexBuilder.tokenGroups). Positions ride the wide shuffle
  * as Int (4 bytes instead of 8 — positions are doc-local and bounded by
  * the per-doc token count, far under 2^31; the chunk-level location
  * space bound is GraftConfig.LocationMax) and are widened to Long only
  * at the encode boundary, halving the dominant shuffle payload.
  */
case class TokenGroup(chunk: Long, term: String, docId: Long, poss: Array[Int])

/** One (chunk, term) posting list (FIXTURES.md §4 `postings`). */
case class PostingRow(chunk: Long, term: String, df: Long, tf: Long,
                      blocks: Array[PostingBlock], postingsBlob: Array[Byte])

/** Document store row (FIXTURES.md §4 `docs`; DocumentData fields from
  * index/PostingList.h:25-31 plus lineage-friendly extras).
  */
case class DocRow(chunk: Long, docId: Long, url: String, title: String,
                  summary: String, numTitleWords: Long, docLength: Long,
                  contentSha: String)

/** Per-chunk corpus statistics (HashBlob header analogs,
  * index/HashBlob.h:202-206). totalPosts includes one ##EndDoc posting per
  * document because the reference's NumberOfPosts sums numberOfPosts over
  * every dictionary entry including the ##EndDoc list
  * (index/HashBlob.h:303, index/index.h:186-188) — the ranker's avgdl and
  * rare-word tests divide by this inclusive count.
  */
case class StatsRow(chunk: Long, numDocs: Long, totalTokens: Long,
                    totalPosts: Long, uniqueTerms: Long, avgdl: Double,
                    chunkDocs: Long)

/** Per-partition build lineage (FIXTURES.md §4 `lineage`; the Spark
  * re-expression of the crawler's periodic checkpoint + restart pattern,
  * crawler/crawler_frontier.hpp:315-428). A chunk with status=complete for
  * a stage is skipped on resume.
  */
case class LineageRow(stage: String, chunk: Long, termMin: String,
                      termMax: String, docMin: Long, docMax: Long,
                      rows: Long, bytes: Long, status: String)
