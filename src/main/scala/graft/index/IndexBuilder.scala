package graft.index

import org.apache.spark.sql.{Column, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.corpus.Corpus
import graft.tokenizer.Tokenizer

/** Index-build pipeline: tokenize -> per-(chunk, term) aggregation ->
  * compressed posting chunks + document store + per-chunk stats, with
  * per-partition lineage for resume (SURVEY.md §3.1, §7).
  *
  * The one unavoidable wide shuffle routes each doc's data to its chunk.
  * The default "bychunk" strategy moves the RAW DOCS (shuffle bytes ==
  * corpus bytes, the floor) and tokenizes+builds reduce-side, holding one
  * chunk's postings in memory — exactly the reference's per-chunk build
  * memory model, sized by chunkDocs (config.h:12 caps a chunk at 30k
  * docs / ~8 MB doc data precisely so this fits). The token-stream
  * strategies (grouped/sorted/aggregator/salted) keep memory bounded by
  * one TERM's chunk postings instead — use them (or a smaller chunkDocs)
  * when documents are so large that a chunk outgrows executor memory,
  * and the salted path for df≈N skew. Everything downstream is
  * chunk-partitioned and writes with dynamic partition overwrite so a
  * resumed build only rewrites incomplete chunks.
  */
object IndexBuilder {

  /** @param chunkDocs  docs per chunk (config.h:12; tests override)
    * @param salts      >1 enables the two-level salted aggregation for
    *                   high-df terms: stage 1 aggregates contiguous docId
    *                   range slices, stage 2 concatenates the sorted runs
    * @param strategy   "bychunk": shuffle the raw docs by chunk (shuffle
    *                   bytes == corpus bytes) and build each chunk's
    *                   postings in one reduce-side pass — see
    *                   [[buildPostingsByChunk]];
    *                   "aligned": ZERO-exchange bychunk for input whose
    *                   partitions are already docId-ascending and
    *                   chunk-aligned (the ingest's own storage order) —
    *                   order enforced task-side, chunk-straddle detected
    *                   by post-write extent validation; see
    *                   [[buildCombinedAligned]];
    *                   "grouped": tokenize emits one row per
    *                   (doc, term) carrying all positions (map-side
    *                   grouping is free — every position of the pair is in
    *                   the same input row), then repartition by
    *                   (chunk, term) + sortWithinPartitions + streaming
    *                   encode. ~3x fewer shuffle/sort rows than the flat
    *                   stream; measured 36% faster on the aggregation
    *                   stage at 500k docs (BuildProfile). "sorted": the
    *                   flat Token stream with the same shuffle+sort+encode
    *                   (whole-stage-codegen tokenize, no objects before
    *                   the shuffle); "aggregator": the typed Aggregator
    *                   path (partial/final map-side combine — fewer but
    *                   fatter shuffle records; measurably slower at high
    *                   token volume because buffers are object-serialized)
    */
  case class BuildConfig(chunkDocs: Long = GraftConfig.ChunkDocs, salts: Int = 1,
                         strategy: String = "bychunk")

  def chunkOf(docId: Long, chunkDocs: Long): Long = docId / chunkDocs

  /** Tokenize into the posting stream (title terms '#'-decorated, title
    * first, 1-based positions; index/index.h:122-176).
    *
    * Implemented with Catalyst column expressions, not a typed flatMap:
    * the whole stage stays in whole-stage codegen over UnsafeRows with
    * zero per-token object allocation — at 10^7+ tokens the JVM
    * allocation rate of one Token object per posting is what stops a
    * single-node build from scaling past a few cores. Must stay
    * row-identical to graft.tokenizer.Tokenizer.postings (asserted in
    * IndexBuilderSpec).
    */
  def tokens(docs: Dataset[IdDoc], cfg: BuildConfig): Dataset[Token] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val chunkDocs = cfg.chunkDocs
    val titleArr = filter(
      transform(
        filter(split(col("path"), "[^A-Za-z]+"), t => length(t) > 0),
        x => concat(lit("#"), lower(x))),
      t => length(t) < GraftConfig.TokenMaxSize)
    val bodyArr = transform(
      filter(split(col("content"), "\\s+"),
        t => t.rlike("^[A-Za-z]+$") && length(t) < GraftConfig.TokenMaxSize),
      x => lower(x))
    docs.toDF()
      .select(col("docId"),
        floor(col("docId") / chunkDocs).cast("long").as("chunk"),
        posexplode(concat(titleArr, bodyArr)))
      .select(col("chunk"), col("col").as("term"), col("docId"),
        (col("pos") + 1).cast("long").as("pos"))
      .as[Token]
  }

  /** Map-side grouped tokenizer: one row per (doc, term) carrying ALL of
    * that term's positions in the doc, produced inside the tokenize pass
    * (every position of a (doc, term) pair lives in the same input row, so
    * the grouping is free — no extra shuffle). At ~57 tokens/doc over
    * ~20 distinct terms this cuts the wide shuffle's row count ~3x and the
    * Tungsten sort's key comparisons with it; positions arrive already
    * ascending because tokenize order is ascending. ArrayBuilder.ofLong
    * keeps the position buffers primitive (no boxing; see
    * memory/graft-env-gotchas.md).
    */
  def tokenGroups(docs: Dataset[IdDoc], cfg: BuildConfig): Dataset[TokenGroup] = {
    import docs.sparkSession.implicits._
    val chunkDocs = cfg.chunkDocs
    docs.mapPartitions { it =>
      it.flatMap { d =>
        val chunk = chunkOf(d.docId, chunkDocs)
        val title = Tokenizer.titleTokens(d.path)
        val body = Tokenizer.bodyTokens(d.content)
        // Int positions (see TokenGroup): guard the widening invariant
        // once per doc, not per token
        require(title.size.toLong + body.size < Int.MaxValue,
          s"doc ${d.docId} token count overflows Int positions")
        val m = new java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuilder.ofInt]()
        var pos = 1
        def add(term: String): Unit = {
          var b = m.get(term)
          if (b == null) { b = new scala.collection.mutable.ArrayBuilder.ofInt; m.put(term, b) }
          b += pos
          pos += 1
        }
        title.foreach(add)
        body.foreach(add)
        val out = new Array[TokenGroup](m.size)
        val eit = m.entrySet().iterator()
        var i = 0
        while (eit.hasNext) {
          val e = eit.next()
          out(i) = TokenGroup(chunk, e.getKey, d.docId, e.getValue.result())
          i += 1
        }
        out
      }
    }
  }

  /** Grouped-row posting build: shuffle the (chunk, term, docId, poss)
    * groups BY CHUNK ONLY, sort within partitions by (chunk, term, docId),
    * and stream the encode exactly as [[buildPostingsSorted]] does — the
    * position arrays drop straight into the codec's per-doc buffers. Must
    * be blob-identical to the sorted strategy (strategy-equivalence spec).
    *
    * Chunk-only partitioning means the OUTPUT is already laid out the way
    * the persisted table is partitioned (a chunk never splits across
    * tasks), so [[build]] writes it with partitionBy(chunk) directly: no
    * second shuffle of the encoded blobs, no cache materialization, no
    * small-files commit storm (files written = chunks). Parallelism is
    * capped at the chunk count — thousands at production scale (30k docs
    * per chunk), and >= the core count for every bench/test corpus here.
    */
  def buildPostingsGrouped(groups: Dataset[TokenGroup]): Dataset[PostingRow] = {
    import groups.sparkSession.implicits._
    groups.toDF()
      .repartition(col("chunk"))
      .sortWithinPartitions(col("chunk"), col("term"), col("docId"))
      .as[TokenGroup]
      .mapPartitions { it =>
        new Iterator[PostingRow] {
          private val docs = new scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]
          private var pending: TokenGroup = _
          private var nextRow: PostingRow = _

          // widen the Int shuffle positions at the encode boundary so the
          // codec (and therefore the blob) is untouched
          private def widen(a: Array[Int]): Array[Long] = {
            val out = new Array[Long](a.length)
            var i = 0
            while (i < a.length) { out(i) = a(i).toLong; i += 1 }
            out
          }

          private def encodeRun(chunk: Long, term: String): PostingRow = {
            val (df, tf, blocks, blob) = graft.codec.PostingCodec.encode(docs)
            docs.clear()
            PostingRow(chunk, term, df, tf, blocks, blob)
          }

          private def advance(): Unit = {
            nextRow = null
            if (pending == null && !it.hasNext) return
            var cur = if (pending != null) pending else it.next()
            pending = null
            val chunk = cur.chunk
            val term = cur.term
            while (cur != null) {
              if (cur.chunk != chunk || cur.term != term) {
                pending = cur
                nextRow = encodeRun(chunk, term)
                return
              }
              docs += ((cur.docId, widen(cur.poss)))
              cur = if (it.hasNext) it.next() else null
            }
            nextRow = encodeRun(chunk, term)
          }

          def hasNext: Boolean = {
            if (nextRow == null) advance()
            nextRow != null
          }
          def next(): PostingRow = {
            if (!hasNext) throw new NoSuchElementException
            val r = nextRow; nextRow = null; r
          }
        }
      }
  }

  /** "bychunk" strategy: shuffle the RAW DOCS by chunk — so the wide
    * exchange moves exactly the corpus bytes, the information floor
    * (~6x less than the per-(doc,term) grouped rows, which repeat the
    * term string and row overhead for every pair) — then tokenize and
    * build each chunk's complete posting set in one reduce-side pass:
    * the reference's per-chunk in-memory index build (index/index.h
    * build pass) re-expressed as a Spark partition task. Tokenize runs
    * AFTER the exchange, so the shuffle's bandwidth share shrinks and
    * the post-shuffle work is CPU-bound (scales with cores — the term
    * that decides N->4N efficiency on a bandwidth-contended host).
    * Memory is bounded by ONE chunk's postings, the same bound the
    * reference's build holds (30k docs/chunk). Output must be
    * blob-identical to every other strategy (5-way equivalence spec).
    */
  def buildPostingsByChunk(docs: Dataset[IdDoc], cfg: BuildConfig): Dataset[PostingRow] = {
    import docs.sparkSession.implicits._
    buildCombinedByChunk(docs, cfg).filter(_.kind == "p").map(IndexRow.toPosting)
  }

  /** The bychunk reduce pass proper, emitting BOTH tables' rows: each
    * shuffled doc is tokenized exactly once ([[Tokenizer.tokenizeAll]]),
    * feeding the chunk's in-memory posting accumulation AND its DocRow
    * (title/summary/docLength/sha) — so a combined-layout build
    * generates, tokenizes, shuffles, and writes the corpus once, where
    * the two-table flow paid a second full generate+tokenize+shuffle
    * for the docs table (measured ~40% of build wall at factor 300).
    * Doc rows are emitted ahead of the chunk's term-sorted posting rows.
    */
  def buildCombinedByChunk(docs: Dataset[IdDoc], cfg: BuildConfig): Dataset[IndexRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val chunkDocs = cfg.chunkDocs
    docs.toDF()
      .withColumn("chunk", floor(col("docId") / chunkDocs).cast("long"))
      .repartition(col("chunk"))
      .sortWithinPartitions(col("chunk"), col("docId"))
      .select(col("chunk"), col("docId"), col("repo"), col("path"),
        col("commit"), col("content"))
      .as[(Long, Long, String, String, String, String)]
      .mapPartitions(it => combinedReduce(it))
  }

  /** "aligned" strategy: ZERO-exchange combined build for input whose
    * partitions are already docId-ascending and chunk-aligned (no chunk
    * straddles a partition boundary) — the layout the ingest itself
    * produces: [[Corpus.assignDocIds]] hands out dense ids in storage
    * order, so a corpus read back in the order it was written satisfies
    * the precondition naturally (the Iceberg-table model of the north
    * rule: files sorted by id, splits respect sort order). Where bychunk
    * pays one corpus-sized wide exchange to co-locate each chunk's docs,
    * this path tokenizes+builds+writes inside the input partitions — at
    * 100 TB that removes 2x corpus bytes of shuffle write+read traffic,
    * and on the bench VM it removes the memory-bandwidth term that bends
    * the N->4N curve (BASELINE.md). Blob-identical to bychunk (spec).
    *
    * Safety is two-layered because a violated precondition would
    * silently corrupt the index (two partial posting sets for one chunk):
    *  - ORDER is enforced task-side: a non-ascending docId fails the
    *    task (and thus the write) before anything commits;
    *  - STRADDLE (a chunk split across partitions) is invisible locally,
    *    so every partition reports its (minDocId, maxDocId) extent
    *    through `extents`; [[build]] validates the collected extents
    *    after the write and deletes the output + throws if any two
    *    partitions overlap or share a chunk.
    */
  def buildCombinedAligned(docs: Dataset[IdDoc], cfg: BuildConfig,
      extents: org.apache.spark.util.CollectionAccumulator[(Long, Long)]): Dataset[IndexRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val chunkDocs = cfg.chunkDocs
    docs.toDF()
      // narrow projection only — NO repartition/sort: the input's own
      // partitioning and order are the plan (PlanAudit pins zero
      // Exchange between scan and write)
      .select(floor(col("docId") / chunkDocs).cast("long").as("chunk"),
        col("docId"), col("repo"), col("path"), col("commit"), col("content"))
      .as[(Long, Long, String, String, String, String)]
      .mapPartitions { raw =>
        var minId = Long.MaxValue
        var maxId = Long.MinValue
        var reported = false
        val checked = raw.map { r =>
          val id = r._2
          if (maxId != Long.MinValue && id <= maxId)
            throw new IllegalStateException(
              s"aligned build requires docId-ascending partitions: saw $id after $maxId " +
              "(re-sort the input or use strategy=bychunk)")
          if (id < minId) minId = id
          maxId = id
          r
        }
        val out = combinedReduce(checked)
        new Iterator[IndexRow] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && !reported) {
              // empty partitions report nothing; the extent is added
              // exactly once, after the reduce drained the whole input
              if (maxId != Long.MinValue) extents.add((minId, maxId))
              reported = true
            }
            h
          }
          def next(): IndexRow = out.next()
        }
      }
  }

  /** The shared reduce kernel of the bychunk and aligned strategies:
    * consumes (chunk, docId, ...) rows that are chunk-contiguous and
    * docId-ascending within each chunk, tokenizes each doc exactly once,
    * and emits the chunk's doc rows followed by its term-sorted posting
    * rows. Callers own the co-location guarantee (bychunk: the wide
    * exchange; aligned: the input's ingest order + extent validation).
    */
  private def combinedReduce(
      it: Iterator[(Long, Long, String, String, String, String)]): Iterator[IndexRow] = {
        new Iterator[IndexRow] {
          // per-chunk accumulator: insertion-ordered term -> sorted run
          // of (docId, positions); docs arrive docId-ascending, so each
          // term's run is ascending by construction
          private var curChunk = Long.MinValue
          private val acc = new java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]]()
          private val docRows = new scala.collection.mutable.ArrayBuffer[IndexRow]
          private var outRows: Iterator[IndexRow] = Iterator.empty
          private var exhausted = false

          private def addDoc(chunk: Long, docId: Long, repo: String,
                             path: String, commit: String, content: String): Unit = {
            val t = Tokenizer.tokenizeAll(path, content)
            val m = new java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuilder.ofLong]()
            var pos = 1L
            def add(term: String): Unit = {
              var b = m.get(term)
              if (b == null) { b = new scala.collection.mutable.ArrayBuilder.ofLong; m.put(term, b) }
              b += pos
              pos += 1
            }
            t.titleToks.foreach(add)
            t.bodyToks.foreach(add)
            val eit = m.entrySet().iterator()
            while (eit.hasNext) {
              val e = eit.next()
              var run = acc.get(e.getKey)
              if (run == null) {
                run = new scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]
                acc.put(e.getKey, run)
              }
              run += ((docId, e.getValue.result()))
            }
            docRows += IndexRow.ofDoc(DocRow(chunk, docId,
              Corpus.url(repo, path, commit), t.title, t.summary,
              t.numTitleWords,
              (t.titleToks.length + t.bodyToks.length).toLong,
              Sha.hex256(if (content == null) "" else content)))
          }

          private def flushChunk(): Iterator[IndexRow] = {
            val chunk = curChunk
            val dr = docRows.toArray
            docRows.clear()
            val pr: Iterator[IndexRow] =
              if (acc.isEmpty) Iterator.empty
              else {
                import scala.jdk.CollectionConverters._
                // sorted term order for deterministic row/file layout
                // (matches the grouped strategy's sortWithinPartitions)
                val entries = acc.entrySet().iterator().asScala.toArray
                  .sortBy(_.getKey)
                acc.clear()
                entries.iterator.map { e =>
                  val (df, tf, blocks, blob) = graft.codec.PostingCodec.encode(e.getValue)
                  IndexRow.ofPosting(PostingRow(chunk, e.getKey, df, tf, blocks, blob))
                }
              }
            dr.iterator ++ pr
          }

          private def advance(): Unit = {
            while (!outRows.hasNext && !exhausted) {
              if (!it.hasNext) { exhausted = true; outRows = flushChunk() }
              else {
                val (chunk, docId, repo, path, commit, content) = it.next()
                if (chunk != curChunk && curChunk != Long.MinValue) {
                  val flushed = flushChunk()
                  curChunk = chunk
                  addDoc(chunk, docId, repo, path, commit, content)
                  outRows = flushed
                } else {
                  curChunk = chunk
                  addDoc(chunk, docId, repo, path, commit, content)
                }
              }
            }
          }

          def hasNext: Boolean = { advance(); outRows.hasNext }
          def next(): IndexRow = {
            if (!hasNext) throw new NoSuchElementException
            outRows.next()
          }
        }
  }

  /** The typed-flatMap tokenizer (kept as the cross-check reference for
    * the Catalyst version; shares the frozen Tokenizer object with the
    * oracle).
    */
  def tokensTyped(docs: Dataset[IdDoc], cfg: BuildConfig): Dataset[Token] = {
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
    if (cfg.salts <= 1 && cfg.strategy != "aggregator") {
      // "grouped" arriving here (a flat Token stream — the grouped rows
      // are only produced by tokenGroups/buildPostingsFor) takes the
      // equivalent sorted path rather than silently degrading to the
      // object-serialized aggregator
      buildPostingsSorted(toks)
    } else if (cfg.salts <= 1) {
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

  /** Strategy dispatch from the source docs: "grouped" tokenizes into
    * per-(doc, term) position groups (3x fewer shuffle rows), everything
    * else goes through the flat Token stream.
    */
  def buildPostingsFor(docs: Dataset[IdDoc], cfg: BuildConfig): Dataset[PostingRow] =
    // "aligned" is a build()-level fast path (its zero-exchange claim and
    // extent validation live there); every other entry point gets the
    // order-insensitive bychunk plan with identical blobs
    if (cfg.salts <= 1 && (cfg.strategy == "bychunk" || cfg.strategy == "aligned"))
      buildPostingsByChunk(docs, cfg)
    else if (cfg.salts <= 1 && cfg.strategy == "grouped")
      buildPostingsGrouped(tokenGroups(docs, cfg))
    else buildPostings(tokens(docs, cfg), cfg)

  /** Sort-based posting build: one shuffle of compact (chunk, term,
    * docId, pos) rows hash-partitioned on (chunk, term), Tungsten-sorted
    * within partitions, then a single streaming pass that delta+varint
    * encodes each (chunk, term) run. Memory is bounded by ONE term's
    * postings within one chunk regardless of input size; everything
    * before the encode stays in whole-stage codegen.
    */
  def buildPostingsSorted(toks: Dataset[Token]): Dataset[PostingRow] = {
    import toks.sparkSession.implicits._
    toks.toDF()
      .repartition(col("chunk"), col("term"))
      .sortWithinPartitions(col("chunk"), col("term"), col("docId"), col("pos"))
      .as[Token]
      .mapPartitions { it =>
        new Iterator[PostingRow] {
          private val docs = new scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]
          private val poss = new scala.collection.mutable.ArrayBuffer[Long]
          private var curDoc = -1L
          private var pending: Token = _
          private var nextRow: PostingRow = _

          private def flushDoc(): Unit =
            if (curDoc >= 0) { docs += ((curDoc, poss.toArray)); poss.clear(); curDoc = -1 }

          private def encodeRun(chunk: Long, term: String): PostingRow = {
            flushDoc()
            val (df, tf, blocks, blob) = graft.codec.PostingCodec.encode(docs)
            docs.clear()
            PostingRow(chunk, term, df, tf, blocks, blob)
          }

          private def advance(): Unit = {
            nextRow = null
            if (pending == null && !it.hasNext) return
            var cur = if (pending != null) pending else it.next()
            pending = null
            val chunk = cur.chunk
            val term = cur.term
            while (cur != null) {
              if (cur.chunk != chunk || cur.term != term) {
                pending = cur
                nextRow = encodeRun(chunk, term)
                return
              }
              if (cur.docId != curDoc) { flushDoc(); curDoc = cur.docId }
              poss += cur.pos
              cur = if (it.hasNext) it.next() else null
            }
            nextRow = encodeRun(chunk, term)
          }

          def hasNext: Boolean = {
            if (nextRow == null) advance()
            nextRow != null
          }
          def next(): PostingRow = {
            if (!hasNext) throw new NoSuchElementException
            val r = nextRow; nextRow = null; r
          }
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
      val m = Tokenizer.docMeta(d.path, d.content)
      DocRow(
        chunk = chunkOf(d.docId, chunkDocs),
        docId = d.docId,
        url = Corpus.url(d.repo, d.path, d.commit),
        title = m.title,
        summary = m.summary,
        numTitleWords = m.numTitleWords,
        docLength = m.docLength,
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
        (($"totalTokens" + $"numDocs").cast("double") / lit(cfg.chunkDocs.toDouble)).as("avgdl"),
        // persisted so query engines can derive docId -> chunk (partition
        // pruning on the docs table) without out-of-band config
        lit(cfg.chunkDocs).as("chunkDocs"))
      .as[StatsRow]
  }

  // ---- persistence + lineage ----

  def postingsDir(out: String) = s"$out/postings"
  def docsDir(out: String) = s"$out/docs"
  def statsDir(out: String) = s"$out/stats"
  def lineageDir(out: String) = s"$out/lineage"
  def tombstonesDir(out: String) = s"$out/tombstones"

  /** Existence probe through the path's OWN FileSystem (Hadoop conf):
    * layout/resume dispatch must behave identically on hdfs://, s3a://
    * and file:// — a java.io.File probe reports every non-local URI as
    * missing, which here would misread a legacy two-table index as
    * combined-layout and write union-schema rows into it (the
    * mixed-schema corruption CLAUDE.md warns about).
    */
  private[graft] def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Content fingerprint of a small meta table's directory: a fold of
    * every direct child's (name, length, mtime) plus the dir's own
    * mtime, or -1 when the path is missing. Strictly stronger than a
    * bare mtime as a cache key: two rewrites landing inside one
    * mtime tick (ms on ext4, coarser elsewhere) still differ because a
    * fresh parquet write's part-file names carry a new random UUID.
    * A driver-side FS listing, no Spark job.
    */
  private[graft] def pathFingerprint(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      var h = fs.getFileStatus(p).getModificationTime
      fs.listStatus(p).foreach { st =>
        h = h * 1000003L + st.getPath.getName.hashCode.toLong
        h = h * 1000003L + st.getLen
        h = h * 1000003L + st.getModificationTime
      }
      if (h == -1L) 0L else h // reserve -1 for "missing"
    }
  }

  /** (visible file count, total visible bytes) under `dir`, RECURSIVE
    * (partitioned tables nest chunk dirs) and skipping hidden entries
    * (`_SUCCESS`, committer temporaries). (0, 0) when the path is
    * missing. A driver-side FS walk, no Spark job — the cheap monotone
    * signal serving tokens are built from: parquet appends only ever
    * ADD visible files (existing part files are never rewritten), so
    * both components are non-decreasing until a deleteTree resets them.
    */
  private[graft] def dirFileSummary(spark: SparkSession,
                                    dir: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (0L, 0L)
    else {
      var n = 0L
      var bytes = 0L
      def walk(d: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(d).foreach { st =>
          val name = st.getPath.getName
          if (!name.startsWith("_") && !name.startsWith(".")) {
            if (st.isDirectory) walk(st.getPath)
            else { n += 1L; bytes += st.getLen }
          }
        }
      walk(p)
      (n, bytes)
    }
  }

  /** Recursive delete through the path's own FileSystem (see
    * [[pathExists]] for why java.io/java.nio must not be used here).
    */
  private[index] def deleteTree(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** The index's docId high-water mark: max docMax over the lineage
    * history's complete docs-stage rows. The corpus extent in O(lineage)
    * — never a corpus scan. Monotone across appends AND compactions
    * (history rows are never removed), so docIds are never reused even
    * after the docs carrying them are purged.
    */
  def docIdHighWater(spark: SparkSession, outDir: String): Long = {
    import spark.implicits._
    require(pathExists(spark, lineageDir(outDir)),
      s"docIdHighWater: index at $outDir has no lineage table")
    spark.read.parquet(lineageDir(outDir))
      .filter($"stage" === "docs" && $"status" === "complete")
      .agg(max($"docMax")).as[Long].head()
  }

  /** Chunks already marked complete for `stage` in the lineage table. */
  def completedChunks(spark: SparkSession, outDir: String, stage: String): Set[Long] = {
    import spark.implicits._
    if (!pathExists(spark, lineageDir(outDir))) return Set.empty
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
  /** Wall-clock phase logging for scaling diagnostics; enabled by
    * SPARK_GRAFT_BUILD_PHASES=1 (stderr, one line per phase).
    */
  private def phased[T](name: String)(f: => T): T =
    if (!sys.env.contains("SPARK_GRAFT_BUILD_PHASES")) f
    else {
      val t0 = System.nanoTime()
      val r = f
      Console.err.println(f"[build-phase] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

  def build(spark: SparkSession, src: Dataset[IdDoc], outDir: String,
            cfg: BuildConfig = BuildConfig()): Set[Long] = {
    import spark.implicits._
    // dynamic partition overwrite exists for RESUME (only rebuilt chunks
    // are replaced) but its commit is a DRIVER-SIDE per-partition
    // directory move — a serial term proportional to the chunk count. A
    // fresh build into an empty/new table gets identical semantics from
    // static overwrite, whose task-side commit (v2 algorithm) keeps the
    // driver out of the per-chunk file shuffling.
    val done0 = completedChunks(spark, outDir, "postings")
      .intersect(completedChunks(spark, outDir, "docs"))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode",
      if (done0.isEmpty) "static" else "dynamic")

    val done = done0
    val chunkDocs = cfg.chunkDocs
    val fresh = done.isEmpty
    val pending = if (fresh) src else {
      val doneB = spark.sparkContext.broadcast(done)
      src.filter(d => !doneB.value.contains(chunkOf(d.docId, chunkDocs)))
    }
    // the emptiness probe is itself a job; only pay it on resumed builds
    if (!fresh && pending.isEmpty) return Set.empty

    val singlePass = cfg.salts <= 1 &&
      (cfg.strategy == "grouped" || cfg.strategy == "bychunk")
    // which physical layout this index uses: a fresh bychunk build gets
    // the combined one-table layout; a resumed build keeps whatever
    // layout the existing index has (mixing schemas inside one
    // partitioned table would corrupt it), detected by the docs table's
    // presence. Fresh grouped/sorted/aggregator/salted keep two tables.
    val combinedLayout =
      if (fresh) cfg.salts <= 1 &&
        (cfg.strategy == "bychunk" || cfg.strategy == "aligned")
      else !pathExists(spark, docsDir(outDir))
    if (combinedLayout) {
      // combined single-pass flow: ONE job generates, tokenizes,
      // shuffles, and writes both tables' rows (kind-discriminated) —
      // see buildCombinedByChunk. A cross-strategy resume onto a
      // combined index routes the strategy's posting rows + a docs pass
      // through the same union schema so partitions stay homogeneous.
      val extentsAcc =
        if (cfg.salts <= 1 && cfg.strategy == "aligned")
          Some(spark.sparkContext.collectionAccumulator[(Long, Long)]("alignedExtents"))
        else None
      val combined =
        if (cfg.salts <= 1 && cfg.strategy == "bychunk")
          buildCombinedByChunk(pending, cfg)
        else if (extentsAcc.isDefined)
          buildCombinedAligned(pending, cfg, extentsAcc.get)
        else {
          val p = buildPostingsFor(pending, cfg).map(IndexRow.ofPosting)
          val d = buildDocs(pending, cfg).map(IndexRow.ofDoc)
          p.unionByName(d).repartition(col("chunk")).as[IndexRow]
        }
      phased("combined write") {
        combined
          .write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(postingsDir(outDir))
      }
      extentsAcc.foreach(acc =>
        validateAlignedExtents(spark, acc, chunkDocs, outDir))
      // a fresh combined build over a legacy index replaces postingsDir
      // wholesale (static overwrite) but would leave the old two-table
      // docs dir behind — and readDocs dispatches on its presence
      if (fresh) deleteTree(spark, docsDir(outDir))
    } else if (singlePass) {
      // single-pass two-table flow (grouped; bychunk resuming a legacy
      // index): the chunk-partitioned build writes straight to the
      // table layout — no cache materialization, no second shuffle of
      // encoded blobs. Lineage/stats re-derive from the written tables
      // (pruned parquet reads; the only blob touch is the byte count).
      val postings =
        if (cfg.strategy == "bychunk") buildPostingsByChunk(pending, cfg)
        else buildPostingsGrouped(tokenGroups(pending, cfg))
      phased("postings write") {
        postings
          .write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(postingsDir(outDir))
      }
      phased("docs write") {
        buildDocs(pending, cfg).repartition(col("chunk"))
          .write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(docsDir(outDir))
      }
    } else {
      // stats/lineage re-derive from the written tables (below), so each
      // dataset feeds exactly one action — no persist needed. The
      // repartition by the partition column before writing matters:
      // without it every shuffle task writes a file into every chunk
      // directory (tasks x chunks small files) and the commit protocol's
      // rename storm becomes a serial fixed cost
      buildDocs(pending, cfg).repartition(col("chunk"))
        .write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(docsDir(outDir))
      buildPostingsFor(pending, cfg).repartition(col("chunk"))
        .write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(postingsDir(outDir))
    }

    // stats covers the full index; the re-read is cheap because parquet
    // column pruning touches only (chunk, docLength) / (chunk), never the
    // posting blobs
    val postingsR = IndexStore.readPostings(spark, outDir)
    val docsR = IndexStore.readDocs(spark, outDir)
    phased("stats") {
      buildStats(docsR, postingsR, cfg)
        .write.mode(SaveMode.Overwrite).parquet(statsDir(outDir))
    }

    // lineage covers the chunks built THIS invocation: the read-back also
    // contains previously-completed chunks on a resume, so exclude `done`
    // (columnar partition filter — resumes carry modest chunk lists; a
    // broadcast anti-join would replace isin if they ever grew huge)
    val chunkPred: Option[Column] =
      if (done.isEmpty) None else Some(!col("chunk").isin(done.toSeq: _*))
    val lineageRows = phased("lineage collect") {
      deriveLineage(spark, outDir, docsR, chunkPred)
    }
    phased("lineage write") {
      spark.createDataset(lineageRows.toIndexedSeq)
        .write.mode(SaveMode.Append).parquet(lineageDir(outDir))
    }
    lineageRows.filter(_.stage == "docs").map(_.chunk).toSet
  }

  /** Post-write validation of the aligned build's precondition (see
    * [[buildCombinedAligned]]): partition extents must be pairwise
    * disjoint AND not share a chunk. On violation every chunk the new
    * extents touch is deleted (surgical: a resumed build's previously
    * completed chunks are never in the new extents) and the build
    * throws — a straddled chunk on disk holds two partial posting sets
    * and must never be readable. Extents are NOT deduplicated: two
    * partitions reporting the identical extent is itself a violation
    * (duplicated input), and a task-retry echo (the only benign source
    * of duplicates; accumulators in transformations can double-report
    * on stage re-execution) fails conservatively rather than risk a
    * silent corruption.
    */
  private def validateAlignedExtents(spark: SparkSession,
      acc: org.apache.spark.util.CollectionAccumulator[(Long, Long)],
      chunkDocs: Long, outDir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val ex = acc.value.asScala.toSeq.sortBy(e => (e._1, e._2))
    val bad = ex.zip(ex.drop(1)).find { case ((_, aMax), (bMin, _)) =>
      aMax >= bMin || chunkOf(aMax, chunkDocs) == chunkOf(bMin, chunkDocs)
    }
    bad.foreach { case ((aMin, aMax), (bMin, bMax)) =>
      val touched = ex.iterator.flatMap { case (a, b) =>
        chunkOf(a, chunkDocs) to chunkOf(b, chunkDocs)
      }.toSet
      touched.foreach(c => deleteTree(spark, s"${postingsDir(outDir)}/chunk=$c"))
      throw new IllegalStateException(
        s"aligned build precondition violated: partition extents [$aMin,$aMax] and " +
        s"[$bMin,$bMax] overlap or share a chunk (chunkDocs=$chunkDocs); the " +
        s"${touched.size} chunks written by this invocation were removed — " +
        "re-sort/partition the input on docId or use strategy=bychunk")
    }
  }

  /** Incremental append: extend an existing index with new docs whose
    * docIds all lie strictly past the existing corpus, producing an index
    * blob-identical to a from-scratch build over the union (pinned by
    * IndexAppendSpec). This is the operator that makes the 10^12-file
    * corpus maintainable: a daily delta never re-reads or re-tokenizes
    * the existing index — the work is proportional to the DELTA, not the
    * corpus.
    *
    * Cost model (the 100 TB story):
    *  - one wide shuffle of the RAW DELTA docs only (shuffle bytes ==
    *    delta bytes, the bychunk floor);
    *  - at most ONE existing chunk — the partial boundary chunk the last
    *    build left behind (chunk roll, config.h:12 analog) — is read back
    *    (partition-pruned) and merged; every other existing partition is
    *    untouched;
    *  - the boundary merge never re-tokenizes: old posting lists are
    *    decoded and concatenated with the delta's (all old docIds < all
    *    new docIds, so runs stay ascending and the delta+varint re-encode
    *    is byte-identical to a full build's), memory bounded by one TERM's
    *    chunk postings;
    *  - writes go through dynamic partition overwrite, touching only the
    *    boundary + new chunk partitions (the serial per-partition commit
    *    rename is ∝ appended chunks — small by design, that is the point
    *    of append);
    *  - stats are updated incrementally (affected chunks recomputed from
    *    pruned reads, the rest carried over via a tmp-dir swap) and
    *    lineage rows for the affected chunks are appended.
    *
    * Chunk geometry comes from the INDEX's persisted stats, never the
    * caller's cfg: a mismatched chunkDocs would interleave new docs into
    * existing chunks. The existing corpus extent comes from lineage (a
    * tiny table), never a corpus-wide docs scan.
    *
    * Reference analog: the reference rolls to a new chunk when the
    * current one fills and never rewrites closed chunks
    * (index/index.h:84-120 chunk roll; SURVEY.md A9) — append is that
    * semantics as a distributed batch operator.
    *
    * @return the set of chunks written/merged by this invocation
    */
  def appendBuild(spark: SparkSession, newDocs: Dataset[IdDoc], outDir: String,
                  cfg: BuildConfig = BuildConfig()): Set[Long] = {
    import spark.implicits._
    require(pathExists(spark, postingsDir(outDir)),
      s"appendBuild: no existing index at $outDir (use build for a fresh index)")
    require(pathExists(spark, lineageDir(outDir)),
      s"appendBuild: index at $outDir has no lineage table; cannot derive the corpus extent")

    // geometry from the persisted index
    val statsOld = IndexStore.readStats(spark, outDir)
    val persistedCd = statsOld.agg(max($"chunkDocs")).as[Long].head()
    val useCfg = {
      // append deltas arrive from arbitrary sources (streaming batches,
      // ad-hoc frames) with no ordering contract — route "aligned"
      // through the order-insensitive bychunk plan (identical blobs)
      val c0 = if (cfg.strategy == "aligned") cfg.copy(strategy = "bychunk") else cfg
      if (persistedCd > 0) c0.copy(chunkDocs = persistedCd)
      else c0 // pre-chunkDocs-column index: trust the caller's cfg
    }
    val chunkDocs = useCfg.chunkDocs
    val oldDocMax = docIdHighWater(spark, outDir)

    // one job over the delta only
    val extent = newDocs.agg(min($"docId"), max($"docId"), count(lit(1)))
      .as[(Option[Long], Option[Long], Long)].head()
    if (extent._3 == 0L) return Set.empty
    val (newMin, newMax) = (extent._1.get, extent._2.get)
    require(newMin > oldDocMax,
      s"appendBuild: new docIds must lie strictly past the existing corpus " +
        s"(existing docMax=$oldDocMax, new min=$newMin)")

    val boundaryChunk = chunkOf(oldDocMax, chunkDocs)
    val firstNewChunk = chunkOf(newMin, chunkDocs)
    val lastNewChunk = chunkOf(newMax, chunkDocs)
    val mergeNeeded = firstNewChunk == boundaryChunk
    val combinedLayout = !pathExists(spark, docsDir(outDir))

    // appends are the resume shape: only touched partitions are replaced
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    /** strategy dispatch into the combined union schema (shared with
      * build()'s cross-strategy resume path)
      */
    def combinedRowsFor(docs: Dataset[IdDoc]): Dataset[IndexRow] =
      if (useCfg.salts <= 1 && useCfg.strategy == "bychunk")
        buildCombinedByChunk(docs, useCfg)
      else
        buildPostingsFor(docs, useCfg).map(IndexRow.ofPosting)
          .unionByName(buildDocs(docs, useCfg).map(IndexRow.ofDoc))
          .repartition(col("chunk")).as[IndexRow]

    def writeCombined(rows: Dataset[IndexRow]): Unit =
      writeCombinedChunks(rows, outDir)
    def writeTable(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
      writeTableChunks(df, dir)

    // ---- purely-new chunks: exactly a fresh build over the delta, each
    // doc generated/tokenized/shuffled once (combined layout; the legacy
    // path tokenizes once per table — the compat-path tax) ----
    val restDocs =
      if (mergeNeeded) newDocs.filter(d => chunkOf(d.docId, chunkDocs) > boundaryChunk)
      else newDocs
    val restNonEmpty = lastNewChunk > boundaryChunk || !mergeNeeded
    if (restNonEmpty) {
      if (combinedLayout) writeCombined(combinedRowsFor(restDocs))
      else {
        writeTable(buildPostingsFor(restDocs, useCfg).toDF(), postingsDir(outDir))
        writeTable(buildDocs(restDocs, useCfg).toDF(), docsDir(outDir))
      }
    }

    // ---- boundary chunk: merge old partition with the delta's rows ----
    if (mergeNeeded) {
      val bc = boundaryChunk
      val bcDocs = newDocs.filter(d => chunkOf(d.docId, chunkDocs) == bc)
      val oMax = oldDocMax
      // partition-pruned reads of the ONE existing boundary partition.
      // The docId <= oMax filters are replay guards: a crashed append that
      // committed the boundary partition but not the (last-step) lineage
      // row leaves the delta physically merged while the high-water mark
      // says it isn't — a re-run must not double-apply it. In the clean
      // path the filters match everything and cost nothing.
      val oldP = IndexStore.readPostings(spark, outDir).filter($"chunk" === bc)
      val oldD = IndexStore.readDocs(spark, outDir)
        .filter($"chunk" === bc && $"docId" <= oMax)
      // per-term merge: memory bounded by one term's chunk postings; a
      // term present on one side only passes its blob through untouched.
      // All old docIds precede all new ones (the strictly-past require),
      // so decoded runs concatenate ascending and the re-encode is
      // byte-identical to a full build's.
      def mergePostings(newP: Dataset[IndexRow]): Dataset[IndexRow] =
        oldP.map(IndexRow.ofPosting)
          .unionByName(newP)
          .groupByKey(r => (r.chunk, r.term))
          .mapGroups { (key, it) =>
            val rows = it.toArray
            if (rows.length == 1) {
              val r = rows(0)
              // replay guard: a residual already-merged row (no matching
              // delta row can exist for it in a deterministic replay, but
              // a row whose run crosses oMax must still be re-trimmed)
              if (r.kind == "p" && r.blocks.nonEmpty &&
                  r.blocks.head.firstDocId <= oMax &&
                  r.blocks.last.lastDocId > oMax) {
                val runs = graft.codec.PostingCodec.decode(r.df, r.postingsBlob)
                  .filter(_._1 <= oMax)
                val (df, tf, blocks, blob) = graft.codec.PostingCodec.encode(runs)
                IndexRow.ofPosting(PostingRow(key._1, key._2, df, tf, blocks, blob))
              } else r
            } else {
              require(rows.length == 2,
                s"appendBuild: ${rows.length} posting rows for $key (corrupt index?)")
              // old side = the run STARTING at or before the old corpus
              // extent (a partially-applied append may have pushed the old
              // row's LAST docId past oMax — first stays a valid
              // discriminator; two delta-side rows are identical copies,
              // so an arbitrary pick is safe)
              val aOld = rows(0).blocks.head.firstDocId <= oMax
              val (o, n) = if (aOld) (rows(0), rows(1)) else (rows(1), rows(0))
              // replay guard: trim any previously-merged delta runs off
              // the old side before re-concatenating
              val pairs = graft.codec.PostingCodec.decode(o.df, o.postingsBlob)
                .filter(_._1 <= oMax) ++
                graft.codec.PostingCodec.decode(n.df, n.postingsBlob)
              val (df, tf, blocks, blob) = graft.codec.PostingCodec.encode(pairs)
              IndexRow.ofPosting(PostingRow(key._1, key._2, df, tf, blocks, blob))
            }
          }
      if (combinedLayout) {
        // one write job; newRows persisted so the p and d legs share one
        // tokenize pass of the (single-chunk) delta
        val newRows = combinedRowsFor(bcDocs).persist()
        writeCombined(mergePostings(newRows.filter(_.kind == "p"))
          .unionByName(oldD.map(IndexRow.ofDoc))
          .unionByName(newRows.filter(_.kind == "d")))
        newRows.unpersist()
      } else {
        // legacy: postings job reads/overwrites only postingsDir, docs job
        // only docsDir (see writeTable)
        val newP = buildPostingsFor(bcDocs, useCfg).map(IndexRow.ofPosting)
        writeTable(mergePostings(newP).map(IndexRow.toPosting).toDF(),
          postingsDir(outDir))
        writeTable(oldD.unionByName(buildDocs(bcDocs, useCfg)).toDF(),
          docsDir(outDir))
      }
    }

    // ---- incremental stats + lineage for the affected chunks only ----
    val loChunk = if (mergeNeeded) boundaryChunk else firstNewChunk
    refreshStatsAndLineage(spark, outDir,
      $"chunk".between(loChunk, lastNewChunk), useCfg)
  }

  /** Merge an INDEPENDENTLY-BUILT index into `destDir` — the segment-merge
    * half of index maintenance that [[appendBuild]] (which ingests raw
    * docs) cannot cover: per-shard / per-datacenter / per-language indexes
    * built in isolation (each starting its docId space at 0) are combined
    * into one queryable index WITHOUT re-tokenizing a single document.
    * The reference's fleet holds 8 forever-separate per-machine indexes
    * (configs/config.h:5 NUM_INDEX_MACHINE; index/indexServer.cpp serves
    * one chunk set per process) — this operator is the missing
    * consolidation step, expressed over the same chunk-roll geometry
    * (index/index.h:84-120).
    *
    * Mechanics: src docIds are shifted by a CHUNK-ALIGNED offset (the
    * first chunk boundary strictly past dest's docId high-water mark), so
    * `chunkOf` commutes with the shift — src chunk k lands verbatim in
    * dest chunk k + offset/chunkDocs with its within-chunk structure
    * intact. Posting blobs are transcoded (decode → shift docIds →
    * re-encode): positions are doc-local and untouched, run order and
    * block boundaries are shift-invariant, so the result is blob-identical
    * to a from-scratch build over (dest docs ∪ shifted src docs) — pinned
    * by IndexMergeSpec. Doc rows shift (chunk, docId) only.
    *
    * Cost model (the 100 TB story):
    *  - ZERO shuffle in the default combined layout: src's
    *    chunk-partitioned rows map 1:1 into fresh dest partitions (narrow
    *    transcode, no Exchange; the legacy two-table compat path pays one
    *    repartition per table via [[writeTableChunks]]);
    *  - content is never read or re-tokenized — the transcode touches
    *    integer streams only, so merge cost is ∝ src INDEX bytes, not
    *    corpus bytes;
    *  - writes go through dynamic partition overwrite into all-new
    *    partitions (driver-side commit rename ∝ src chunk count — merge
    *    the smaller index into the larger, the classic segment-merge
    *    policy);
    *  - stats/lineage refresh incrementally for the new chunks only.
    *
    * Replay contract (same shape as appendBuild): lineage lands LAST, so
    * the docId high-water mark — and with it the computed offset — moves
    * only once the merge is fully applied; a replay over a partially-
    * applied merge recomputes the SAME offset and dynamic overwrite makes
    * the partition rewrites idempotent. Re-running an already-COMPLETED
    * merge is a second merge (new offset, duplicated content) — the
    * caller contract, exactly like feeding appendBuild the same delta
    * re-numbered.
    *
    * Both indexes must share chunk geometry (persisted chunkDocs), and
    * src must carry no pending tombstones (compact it first — merges are
    * the natural purge point, so shipping tombstones across would hide
    * deleted docs inside fresh partitions). The docId gap this leaves
    * (< chunkDocs slots) is fine: docIds are never required contiguous
    * (lineage keeps the high-water mark).
    *
    * @return (docId offset applied to src, dest chunks written)
    */
  def mergeIndexes(spark: SparkSession, destDir: String, srcDir: String): (Long, Set[Long]) = {
    import spark.implicits._
    require(pathExists(spark, postingsDir(destDir)),
      s"mergeIndexes: no index at dest $destDir")
    require(pathExists(spark, postingsDir(srcDir)),
      s"mergeIndexes: no index at src $srcDir")
    require(pathExists(spark, lineageDir(destDir)),
      s"mergeIndexes: dest index at $destDir has no lineage table; cannot derive the corpus extent")
    val cdDest = IndexStore.readStats(spark, destDir).agg(max($"chunkDocs")).as[Long].head()
    val cdSrc = IndexStore.readStats(spark, srcDir).agg(max($"chunkDocs")).as[Long].head()
    require(cdDest > 0 && cdSrc > 0,
      s"mergeIndexes: both indexes need the persisted chunkDocs stats column " +
        s"(dest=$cdDest, src=$cdSrc); rebuild stats first")
    require(cdDest == cdSrc,
      s"mergeIndexes: chunk geometry must match (dest chunkDocs=$cdDest, src=$cdSrc) " +
        "— a shifted src chunk would otherwise straddle dest chunk boundaries")
    require(IndexStore.readTombstones(spark, srcDir).head(1).isEmpty,
      s"mergeIndexes: src index at $srcDir has pending tombstones; compact it first")
    val destMax = docIdHighWater(spark, destDir)
    val offset = (chunkOf(destMax, cdDest) + 1) * cdDest
    val base = offset / cdDest

    // merged partitions are all new; dynamic overwrite makes partial
    // replays rewrite rather than duplicate them
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val off = offset // serialize primitives, not the enclosing object
    val b = base
    val shiftedP = IndexStore.readPostings(spark, srcDir).map { r =>
      val runs = graft.codec.PostingCodec.decode(r.df, r.postingsBlob)
        .map { case (d, ps) => (d + off, ps) }
      val (df2, tf2, blocks, blob) = graft.codec.PostingCodec.encode(runs)
      PostingRow(r.chunk + b, r.term, df2, tf2, blocks, blob)
    }
    val shiftedD = IndexStore.readDocs(spark, srcDir)
      .map(d => d.copy(chunk = d.chunk + b, docId = d.docId + off))

    val combinedLayout = !pathExists(spark, docsDir(destDir))
    if (combinedLayout) {
      writeCombinedChunks(shiftedP.map(IndexRow.ofPosting)
        .unionByName(shiftedD.map(IndexRow.ofDoc)), destDir)
    } else {
      // legacy two-table compat: separate pipelines per table (the reads
      // come from SRC, so the shared-pipeline re-read hazard doesn't
      // apply, but uniformity keeps the invariant obvious)
      writeTableChunks(shiftedP.toDF(), postingsDir(destDir))
      writeTableChunks(shiftedD.toDF(), docsDir(destDir))
    }

    val written = refreshStatsAndLineage(spark, destDir, $"chunk" >= b,
      BuildConfig(chunkDocs = cdDest))
    (offset, written)
  }

  /** Combined layout: ONE chunk-partitioned write of the union schema into
    * the index's postings table. Caller must have set dynamic partition
    * overwrite when only touched partitions should be replaced.
    */
  private def writeCombinedChunks(rows: Dataset[IndexRow], outDir: String): Unit =
    rows.toDF()
      .sortWithinPartitions(col("chunk"), col("kind"), col("term"), col("docId"))
      .write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(postingsDir(outDir))

  /** Legacy two-table layout: one single-table overwrite. Each legacy
    * write job must read ONLY the table it overwrites: a lazy pipeline
    * shared across two write jobs re-evaluates after the first commit
    * has replaced its input partitions (FAILED_READ_FILE), and caching
    * the shared pipeline instead trips an AQE+InMemoryRelation row
    * duplication (see IndexAppendSpec's legacy test history) — so the
    * postings job and the docs job are built from separate pipelines.
    */
  private def writeTableChunks(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
    df.repartition(col("chunk"))
      .write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(dir)

  /** Incremental stats + lineage maintenance shared by appendBuild and
    * compact: recompute stats rows for chunks matching `affected` from
    * partition-pruned reads, carry every other row over via a tmp-dir swap
    * (parquet refuses an overlapping read/overwrite), then append lineage
    * rows for the affected chunks (Append keeps history; consumers take
    * max(docMax) over complete rows). A chunk left with no rows (fully
    * compacted away) simply drops out of stats and contributes no new
    * lineage row — its historical rows keep the docId high-water mark.
    *
    * @return the affected docs-stage chunks present after the refresh
    */
  private def refreshStatsAndLineage(spark: SparkSession, outDir: String,
                                     affected: Column, cfg: BuildConfig): Set[Long] = {
    import spark.implicits._
    val statsOld = IndexStore.readStats(spark, outDir)
    val docsR = IndexStore.readDocs(spark, outDir)
    val statsNew = buildStats(docsR.filter(affected),
      IndexStore.readPostings(spark, outDir).filter(affected), cfg)
    val statsTmp = statsDir(outDir) + ".tmp"
    statsOld.filter(!affected).unionByName(statsNew)
      .write.mode(SaveMode.Overwrite).parquet(statsTmp)
    val fs = new org.apache.hadoop.fs.Path(statsDir(outDir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    deleteTree(spark, statsDir(outDir))
    require(fs.rename(new org.apache.hadoop.fs.Path(statsTmp),
      new org.apache.hadoop.fs.Path(statsDir(outDir))),
      s"stats swap rename failed for $outDir")
    val lineageRows = deriveLineage(spark, outDir, docsR, Some(affected))
    spark.createDataset(lineageRows.toIndexedSeq)
      .write.mode(SaveMode.Append).parquet(lineageDir(outDir))
    lineageRows.filter(_.stage == "docs").map(_.chunk).toSet
  }

  /** Mark docIds as deleted: append (chunk, docId) rows to a tiny
    * chunk-partitioned tombstone table. O(delta) — no index partition is
    * read or written, so a delete over a 10^12-doc corpus costs the same
    * as over a 10^3-doc one. The postings/doc rows stay physically present
    * until [[compact]] purges them (the reference's only delete story is a
    * full rebuild of its static index — mark+compact is that lifecycle as
    * incremental operators, the liveDocs/segment-rewrite pattern).
    *
    * Chunk geometry comes from the index's persisted stats (a caller cfg
    * could disagree and route tombstones to the wrong partitions); docIds
    * must lie within the corpus extent recorded in lineage. Marking a
    * docId twice, or a docId that was assigned but never indexed, is
    * harmless — compact treats tombstones as a set.
    *
    * @return number of (distinct) tombstones recorded by this call
    */
  def markDeleted(spark: SparkSession, outDir: String, docIds: Dataset[Long]): Long = {
    import spark.implicits._
    require(pathExists(spark, postingsDir(outDir)),
      s"markDeleted: no index at $outDir")
    val persistedCd = IndexStore.readStats(spark, outDir)
      .agg(max($"chunkDocs")).as[Long].head()
    require(persistedCd > 0,
      s"markDeleted: index at $outDir predates the chunkDocs stats column; " +
        "rebuild stats to restore chunk geometry before deleting")
    val docMax = docIdHighWater(spark, outDir)
    // persist: the batch feeds two jobs (extent check + write) and the
    // caller's dataset may not be deterministic across recomputes
    val batch = docIds.distinct().persist()
    try {
      val extent = batch.agg(min($"value"), max($"value"), count(lit(1)))
        .as[(Option[Long], Option[Long], Long)].head()
      if (extent._3 == 0L) return 0L
      require(extent._1.get >= 0L && extent._2.get <= docMax,
        s"markDeleted: docIds [${extent._1.get}, ${extent._2.get}] outside " +
          s"the corpus extent [0, $docMax] of $outDir")
      val cd = persistedCd
      batch.map(id => TombstoneRow(chunkOf(id, cd), id)).toDF()
        .write.mode(SaveMode.Append).partitionBy("chunk")
        .parquet(tombstonesDir(outDir))
      extent._3
    } finally batch.unpersist()
  }

  /** Purge tombstoned docs: rewrite ONLY the chunks that carry tombstones,
    * leaving an index blob-identical to a from-scratch build over the
    * surviving docs (CompactionSpec pins postings/docs/stats equality and
    * untouched-partition file identity). Positions are doc-local (1-based
    * per document, Tokenizer scaladoc), so dropping a doc's runs from a
    * decoded posting list and re-encoding is byte-identical to never
    * having indexed it — no neighbor shifts.
    *
    * Cost model (the 100 TB story): work ∝ tombstoned CHUNKS, never the
    * corpus — each affected partition is read partition-pruned, purged
    * per-row (memory bounded by one term's chunk postings), and replaced
    * via dynamic partition overwrite; stats/lineage are refreshed for the
    * affected chunks only (tmp-swap carry-over). Tombstones stay DATA, not
    * driver state: the purge joins per-chunk collect_set rows against the
    * pruned postings on chunk (Catalyst broadcasts the side when it is
    * small and falls back to a distributed join when it is not), and doc
    * rows drop out through a left_anti join — only the affected CHUNK LIST
    * (one long per chunk) is ever collected. A chunk whose docs are ALL
    * tombstoned gets its partition directory removed outright (dynamic
    * overwrite never replaces a partition with zero output rows). Crash
    * between the partition writes and the tombstone clear is safe: re-run
    * compact and already-purged rows pass through unchanged.
    *
    * @return the set of chunks compacted (tombstone-bearing chunks)
    */
  def compact(spark: SparkSession, outDir: String): Set[Long] = {
    import spark.implicits._
    if (!pathExists(spark, tombstonesDir(outDir))) return Set.empty
    val tombs = IndexStore.readTombstones(spark, outDir)
    val affectedSeq = tombs.map(_.chunk).distinct().collect().sorted.toSeq
    if (affectedSeq.isEmpty) { deleteTree(spark, tombstonesDir(outDir)); return Set.empty }
    val affected = col("chunk").isin(affectedSeq: _*)
    val combinedLayout = !pathExists(spark, docsDir(outDir))
    val persistedCd = IndexStore.readStats(spark, outDir)
      .agg(max($"chunkDocs")).as[Long].head()
    val cfg =
      if (persistedCd > 0) BuildConfig(chunkDocs = persistedCd) else BuildConfig()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    // per-chunk tombstone sets as rows (<= chunkDocs ids each)
    val deadByChunk = tombs.toDF()
      .groupBy($"chunk").agg(collect_set($"docId").as("deadIds"))

    def liveDocs(d: Dataset[DocRow]): Dataset[DocRow] =
      d.join(tombs.toDF(), Seq("chunk", "docId"), "left_anti").as[DocRow]
    /** decode-filter-reencode; rows with no deleted doc keep their original
      * bytes without re-encoding, rows losing every doc are dropped. The
      * chunk's dead set is materialized once per (task, chunk) — rows of
      * one partition dir share their chunk, so the per-row join array is
      * hashed once, not once per posting row.
      */
    def purge(p: Dataset[PostingRow]): Dataset[PostingRow] =
      p.toDF().join(deadByChunk, Seq("chunk"), "inner")
        .as[(Long, String, Long, Long, Array[graft.codec.PostingBlock], Array[Byte], Array[Long])]
        .mapPartitions { it =>
          var cachedChunk = Long.MinValue
          var cachedDead: Set[Long] = Set.empty
          it.flatMap { case (chunk, term, df0, tf0, blocks, blob, deadArr) =>
            if (chunk != cachedChunk) {
              cachedChunk = chunk; cachedDead = deadArr.toSet
            }
            val dead = cachedDead
            val kept = graft.codec.PostingCodec.decode(df0, blob)
              .filterNot(run => dead(run._1))
            if (kept.isEmpty) Iterator.empty
            else if (kept.length.toLong == df0)
              Iterator.single(PostingRow(chunk, term, df0, tf0, blocks, blob))
            else {
              val (df, tf, nblocks, nblob) = graft.codec.PostingCodec.encode(
                scala.collection.immutable.ArraySeq.unsafeWrapArray(kept))
              Iterator.single(PostingRow(chunk, term, df, tf, nblocks, nblob))
            }
          }
        }

    // fully-emptied chunks must be detected BEFORE the write: dynamic
    // overwrite leaves their old partition dirs in place (nothing in the
    // output replaces them), and a post-write probe would read those stale
    // rows right back
    val survivors = liveDocs(IndexStore.readDocs(spark, outDir).filter(affected))
      .groupBy($"chunk").count().as[(Long, Long)].collect().toMap
    val emptied = affectedSeq.filterNot(c => survivors.getOrElse(c, 0L) > 0L)

    if (combinedLayout) {
      // one job: both legs read the pre-commit partition files
      val oldP = IndexStore.readPostings(spark, outDir).filter(affected)
      val oldD = IndexStore.readDocs(spark, outDir).filter(affected)
      writeCombinedChunks(purge(oldP).map(IndexRow.ofPosting)
        .unionByName(liveDocs(oldD).map(IndexRow.ofDoc)), outDir)
    } else {
      // legacy: each job reads only the table it overwrites (see
      // writeTableChunks)
      writeTableChunks(
        purge(IndexStore.readPostings(spark, outDir).filter(affected)).toDF(),
        postingsDir(outDir))
      writeTableChunks(
        liveDocs(IndexStore.readDocs(spark, outDir).filter(affected)).toDF(),
        docsDir(outDir))
    }
    emptied.foreach { c =>
      deleteTree(spark, s"${postingsDir(outDir)}/chunk=$c")
      if (!combinedLayout) deleteTree(spark, s"${docsDir(outDir)}/chunk=$c")
    }

    refreshStatsAndLineage(spark, outDir, affected, cfg)
    deleteTree(spark, tombstonesDir(outDir))
    // champion prefixes of the rewritten chunks are stale-WRONG (no
    // high-water check can see a compact) — repair them, meta-first
    ChampionSidecar.onCompact(spark, outDir, affectedSeq.toSet, emptied.toSet)
    affectedSeq.toSet
  }

  /** Derive per-chunk lineage rows from the persisted tables, restricted
    * to chunks matching `chunkPred` (None = all). Reads the RAW postings
    * frame: the combined layout persists the encode-time blobBytes
    * column, so the bytes aggregate never re-reads the blob column itself
    * (index-sized IO after every build); legacy two-table indexes fall
    * back to length(blob). The predicate is a columnar partition filter,
    * so restricted derivations read only the matching chunk partitions.
    */
  private def deriveLineage(spark: SparkSession, outDir: String,
                            docsR: Dataset[DocRow],
                            chunkPred: Option[Column]): Array[LineageRow] = {
    import spark.implicits._
    val rawPost = spark.read.parquet(postingsDir(outDir))
    val postBase =
      (if (rawPost.columns.contains("kind")) rawPost.filter($"kind" === "p")
       else rawPost).withColumn("chunk", $"chunk".cast("long"))
    val bytesExpr =
      if (rawPost.columns.contains("blobBytes")) sum($"blobBytes")
      else sum(length($"postingsBlob").cast("long"))
    val postingsNew = chunkPred.fold(postBase)(postBase.filter)
    val docsNew = chunkPred.fold(docsR.toDF())(docsR.toDF().filter)
    val postingLineage = postingsNew.groupBy($"chunk").agg(
      min($"term").as("termMin"), max($"term").as("termMax"),
      min(element_at($"blocks", 1).getField("firstDocId")).as("docMin"),
      max(element_at($"blocks", -1).getField("lastDocId")).as("docMax"),
      count(lit(1)).as("rows"), bytesExpr.as("bytes"))
      .select(lit("postings").as("stage"), $"chunk", $"termMin", $"termMax",
        $"docMin", $"docMax", $"rows", $"bytes", lit("complete").as("status"))
    val docLineage = docsNew.groupBy($"chunk").agg(
      min($"docId").as("docMin"), max($"docId").as("docMax"),
      count(lit(1)).as("rows"), sum($"docLength").as("bytes"))
      .select(lit("docs").as("stage"), $"chunk", lit("").as("termMin"),
        lit("").as("termMax"), $"docMin", $"docMax", $"rows", $"bytes",
        lit("complete").as("status"))
    // one job: collect the (tiny) lineage rows
    postingLineage.unionByName(docLineage).as[LineageRow].collect()
  }
}

/** sha256 hex via the JDK (no extra deps). MessageDigest instances are
  * thread-local: getInstance synchronizes on the provider list and
  * serializes 32 executor threads when called per row.
  */
object Sha {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  def hex256(s: String): String = hex256Bytes(s.getBytes("UTF-8"))

  def hex256Bytes(bytes: Array[Byte]): String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) & 0xF0) >> 4)
      out(2 * i + 1) = hexChars(d(i) & 0x0F)
      i += 1
    }
    new String(out)
  }
}

/** Typed readers over a persisted index. `chunk` is a partition directory
  * column, so its inferred type is normalized back to long explicitly.
  */
object IndexStore {
  import org.apache.spark.sql.functions.col

  def readPostings(spark: SparkSession, outDir: String): Dataset[PostingRow] = {
    import spark.implicits._
    val raw = spark.read.parquet(IndexBuilder.postingsDir(outDir))
    // combined layout (kind column): posting rows cohabit with doc rows;
    // the filter rides the scan (parquet predicate) and doc rows'
    // posting columns are RLE nulls, so the extra IO is negligible
    val onlyP = if (raw.columns.contains("kind")) raw.filter(col("kind") === "p") else raw
    onlyP
      .withColumn("chunk", col("chunk").cast("long"))
      .select("chunk", "term", "df", "tf", "blocks", "postingsBlob")
      .as[PostingRow]
  }

  def readDocs(spark: SparkSession, outDir: String): Dataset[DocRow] = {
    import spark.implicits._
    // legacy two-table layout keeps its own docs dir; the combined
    // layout stores doc rows (kind = "d") inside the postings table
    val src =
      if (IndexBuilder.pathExists(spark, IndexBuilder.docsDir(outDir)))
        spark.read.parquet(IndexBuilder.docsDir(outDir))
      else
        spark.read.parquet(IndexBuilder.postingsDir(outDir))
          .filter(col("kind") === "d")
    src
      .withColumn("chunk", col("chunk").cast("long"))
      .select("chunk", "docId", "url", "title", "summary", "numTitleWords",
        "docLength", "contentSha")
      .as[DocRow]
  }

  /** Pending deletion markers (empty if none recorded or already purged by
    * compact). Live-view readers anti-join docs against this; it is tiny
    * by protocol (compaction cadence bounds it).
    */
  def readTombstones(spark: SparkSession, outDir: String): Dataset[TombstoneRow] = {
    import spark.implicits._
    if (!IndexBuilder.pathExists(spark, IndexBuilder.tombstonesDir(outDir)))
      spark.emptyDataset[TombstoneRow]
    else
      spark.read.parquet(IndexBuilder.tombstonesDir(outDir))
        .withColumn("chunk", col("chunk").cast("long"))
        .select("chunk", "docId").as[TombstoneRow]
  }

  /** The LIVE doc view between compactions: doc rows minus pending
    * tombstones (left_anti on (chunk, docId) — the tombstone side is tiny
    * by protocol, so Catalyst broadcasts it). After compact this is
    * identical to readDocs.
    */
  def readDocsLive(spark: SparkSession, outDir: String): Dataset[DocRow] = {
    import spark.implicits._
    readDocs(spark, outDir)
      .join(readTombstones(spark, outDir).toDF(), Seq("chunk", "docId"), "left_anti")
      .as[DocRow]
  }

  def readStats(spark: SparkSession, outDir: String): Dataset[StatsRow] = {
    import spark.implicits._
    val df = spark.read.parquet(IndexBuilder.statsDir(outDir))
    // chunkDocs was added to the stats schema mid-project; indexes
    // persisted before it get the -1 "unknown" sentinel, NOT a guessed
    // default: an old index built with a non-default chunkDocs would
    // otherwise derive a chunk-pruning predicate matching NO partitions
    // and silently return hits with empty metadata. Consumers must skip
    // chunk pruning when chunkDocs < 0 (Bm25Engine falls back to the
    // docId-only filter); rebuild stats to restore pruning.
    val withCd =
      if (df.columns.contains("chunkDocs")) df
      else {
        System.err.println(s"[graft] WARN: stats table at $outDir predates the " +
          "chunkDocs column; chunk pruning disabled for this index (rebuild stats to restore)")
        df.withColumn("chunkDocs", org.apache.spark.sql.functions.lit(-1L))
      }
    withCd.as[StatsRow]
  }
}
