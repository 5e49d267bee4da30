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

/** Union row of the combined single-pass store layout (bychunk builds):
  * one chunk-partitioned table carrying both posting rows (kind = "p",
  * doc fields null/-1) and document rows (kind = "d", posting fields
  * null/-1), written in the same reduce pass that tokenized the docs —
  * the corpus is generated, tokenized, shuffled, and written exactly
  * once per build. IndexStore hides the layout: readPostings /
  * readDocs filter on kind and project, so engines and specs see the
  * same PostingRow / DocRow rows as the legacy two-table layout
  * (grouped/sorted/aggregator/salted still write that one). Parquet
  * column pruning makes the cohabitation cheap: a postings read decodes
  * only posting columns (doc rows contribute RLE nulls), and vice
  * versa.
  */
case class IndexRow(chunk: Long, kind: String, term: String, df: Long,
                    tf: Long, blocks: Array[PostingBlock],
                    postingsBlob: Array[Byte], blobBytes: Long,
                    docId: Long, url: String,
                    title: String, summary: String, numTitleWords: Long,
                    docLength: Long, contentSha: String)

object IndexRow {
  def ofPosting(p: PostingRow): IndexRow =
    IndexRow(p.chunk, "p", p.term, p.df, p.tf, p.blocks, p.postingsBlob,
      p.postingsBlob.length.toLong,
      -1L, null, null, null, -1L, -1L, null)
  def ofDoc(d: DocRow): IndexRow =
    IndexRow(d.chunk, "d", null, -1L, -1L, null, null, -1L, d.docId, d.url,
      d.title, d.summary, d.numTitleWords, d.docLength, d.contentSha)
  def toPosting(r: IndexRow): PostingRow =
    PostingRow(r.chunk, r.term, r.df, r.tf, r.blocks, r.postingsBlob)
  def toDoc(r: IndexRow): DocRow =
    DocRow(r.chunk, r.docId, r.url, r.title, r.summary, r.numTitleWords,
      r.docLength, r.contentSha)
}

/** One deletion marker (IndexBuilder.markDeleted): docId is tombstoned
  * but still physically present in chunk `chunk`'s postings/doc rows until
  * IndexBuilder.compact purges it. Chunk-partitioned like the index tables
  * so compact's reads prune to the affected partitions.
  */
case class TombstoneRow(chunk: Long, docId: Long)

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
