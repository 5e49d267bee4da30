package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.engine.{Bm25Engine, FederatedBm25, FederatedSearch, SearchEngine}
import graft.index.{IndexBuilder, IndexStore}

/** Scatter-gather federation (engine.FederatedBm25): a federated view
  * over K independently-built shard indexes must be docId- AND
  * score-identical to the ONE index mergeIndexes would produce by
  * folding the shards left-to-right — same global stats, same ranking,
  * same metadata — because federation runs the distributed-IR
  * df-exchange and scores every shard against the global statistics
  * (the upgrade over the reference's local-stats per-machine ranking,
  * frontEnd/communicationServer.h:118-130).
  */
class FederationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import IndexBuilder.BuildConfig

  private def corpus(filesPerRepo: Int, seed: Long) = {
    val docs = Corpus.synthetic(spark, 2, filesPerRepo, seed = seed)
    Corpus.assignDocIds(spark, docs)
  }

  /** Top body terms by summed df — real vocabulary, deterministically. */
  private def topTerms(dir: String, n: Int): Seq[String] =
    IndexStore.readPostings(spark, dir).collect()
      .filterNot(_.term.startsWith("#"))
      .groupBy(_.term).map { case (t, rs) => (t, rs.map(_.df).sum) }
      .toSeq.sortBy { case (t, df) => (-df, t) }.take(n).map(_._1)

  test("two-shard federation == consolidated merged index (stats, ranking, metadata)") {
    val cfg = BuildConfig(chunkDocs = 50)
    val idsA = corpus(60, seed = 141).persist() // 120 docs
    val idsB = corpus(40, seed = 142).persist() // 80 docs, ids colliding

    val shardA = SparkTestBase.tempDir("graft_fed_a")
    val shardB = SparkTestBase.tempDir("graft_fed_b")
    val merged = SparkTestBase.tempDir("graft_fed_m") // A rebuilt, then B folded in
    IndexBuilder.build(spark, idsA, shardA, cfg)
    IndexBuilder.build(spark, idsB, shardB, cfg)
    IndexBuilder.build(spark, idsA, merged, cfg)
    val (offset, _) = IndexBuilder.mergeIndexes(spark, merged, shardB)

    val fed = new FederatedBm25(spark, Seq(shardA, shardB))
    assert(fed.offsets === Seq(0L, offset),
      "federated offsets must follow the mergeIndexes fold rule")

    val one = new Bm25Engine(spark, merged)
    assert(fed.corpusStats === one.corpusStats)

    val terms = topTerms(merged, 3)
    val queries = Seq(terms.take(1), terms.take(2), terms)
    for {
      q <- queries
      mode <- Seq(Bm25Engine.Or: Bm25Engine.Mode, Bm25Engine.And)
      wand <- Seq(true, false)
    } {
      val f = fed.searchTerms(q, 10, mode, wand)
      val m = one.searchTerms(q, 10, mode, wand)
      assert(f === m, s"divergence for q=$q mode=$mode wand=$wand")
    }

    // federated Dirichlet QL: the cf-exchange makes the collection model
    // global, so the LM ranking matches the consolidated index too
    for (q <- queries) {
      assert(fed.searchTermsQl(q, 10) === one.searchTermsQl(q, 10),
        s"QL federation divergence for q=$q")
    }

    // metadata resolves from the OWNING shard and matches the merged
    // index's own docs table
    val query = terms.mkString(" ")
    val fh = fed.search(query, 10)
    val mh = one.search(query, 10)
    assert(fh.map(h => (h.docId, h.score, h.url, h.title)) ===
      mh.map(h => (h.docId, h.score, h.url, h.title)))
    assert(fh.forall(h => h.url.nonEmpty && h.title.nonEmpty))

    // exercise BOTH shards: a shard-B term with k > corpus size must
    // surface shifted-global hits, and their metadata must resolve from
    // shard B's docs table exactly as from the merged one
    val bTerm = topTerms(shardB, 1).head
    val fb = fed.search(bTerm, 300)
    val mb = one.search(bTerm, 300)
    assert(fb.map(h => (h.docId, h.score, h.url, h.title)) ===
      mb.map(h => (h.docId, h.score, h.url, h.title)))
    assert(fb.exists(_.docId >= offset), "no hit from the shifted shard")
    idsA.unpersist(); idsB.unpersist()
  }

  test("three-shard chain equals two sequential merges (cumulative offsets)") {
    val cfg = BuildConfig(chunkDocs = 50)
    val idsA = corpus(45, seed = 151) // 90 docs
    val idsB = corpus(30, seed = 152) // 60 docs
    val idsC = corpus(20, seed = 153) // 40 docs
    val shardA = SparkTestBase.tempDir("graft_fed3_a")
    val shardB = SparkTestBase.tempDir("graft_fed3_b")
    val shardC = SparkTestBase.tempDir("graft_fed3_c")
    val merged = SparkTestBase.tempDir("graft_fed3_m")
    IndexBuilder.build(spark, idsA, shardA, cfg)
    IndexBuilder.build(spark, idsB, shardB, cfg)
    IndexBuilder.build(spark, idsC, shardC, cfg)
    IndexBuilder.build(spark, idsA, merged, cfg)
    val (off1, _) = IndexBuilder.mergeIndexes(spark, merged, shardB)
    val (off2, _) = IndexBuilder.mergeIndexes(spark, merged, shardC)

    val fed = new FederatedBm25(spark, Seq(shardA, shardB, shardC))
    assert(fed.offsets === Seq(0L, off1, off2))

    val one = new Bm25Engine(spark, merged)
    assert(fed.corpusStats === one.corpusStats)
    val terms = topTerms(merged, 2)
    for (q <- Seq(terms.take(1), terms)) {
      assert(fed.searchTerms(q, 15) === one.searchTerms(q, 15))
      assert(fed.searchTerms(q, 15, Bm25Engine.And) ===
        one.searchTerms(q, 15, Bm25Engine.And))
    }
  }

  test("federated RefScore == consolidated merged index (the reference serving path)") {
    val cfg = BuildConfig(chunkDocs = 50)
    val idsA = corpus(60, seed = 171) // 120 docs
    val idsB = corpus(40, seed = 172) // 80 docs, colliding ids
    val shardA = SparkTestBase.tempDir("graft_fedr_a")
    val shardB = SparkTestBase.tempDir("graft_fedr_b")
    val merged = SparkTestBase.tempDir("graft_fedr_m")
    IndexBuilder.build(spark, idsA, shardA, cfg)
    IndexBuilder.build(spark, idsB, shardB, cfg)
    IndexBuilder.build(spark, idsA, merged, cfg)
    val (offset, _) = IndexBuilder.mergeIndexes(spark, merged, shardB)

    val fed = new FederatedSearch(spark, Seq(shardA, shardB))
    assert(fed.offsets === Seq(0L, offset))
    val one = new SearchEngine(spark, merged, chunkCapacity = 50)

    val ts = topTerms(merged, 3)
    val queries = Seq(
      ts.head,                                  // single term
      s"${ts(0)} ${ts(1)}",                     // hidden AND
      s"${ts(0)} OR ${ts(1)}",                  // OR
      s"(${ts(0)} OR ${ts(1)}) ${ts(2)}",       // nested
      "\"" + ts(0) + " " + ts(1) + "\"")        // phrase (may be empty)
    queries.foreach { q =>
      val f = fed.search(q)
      val m = one.search(q)
      assert(f === m, s"RefScore federation divergence for query <$q>")
    }
    // federated facet counts are the additive gather of per-shard
    // histograms — equal to the consolidated index's sidebar
    val fTerm = topTerms(merged, 1)
    val fedF = graft.engine.Facets.federatedFacets(spark, Seq(shardA, shardB), fTerm)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val oneF = graft.engine.Facets.conjunctiveFacets(spark, merged, fTerm)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(fedF === oneF)

    // the fan-in actually reaches the SHIFTED shard: the two corpora
    // have disjoint vocabularies and the reference's term-absent abort
    // (ranker.h:718-720) drops chunks missing ANY flattened word even
    // under OR, so the cross-shard probe is shard B's own top term —
    // every hit must come back with a shifted global id
    val tB = topTerms(shardB, 1).head
    val bHits = fed.search(tB, topK = 300)
    assert(bHits === one.search(tB, topK = 300))
    assert(bHits.nonEmpty && bHits.forall(_.docId >= offset),
      "expected shifted-shard hits for a shard-B-only term")
    assert(fed.searchPage(ts.head, 1) === one.searchPage(ts.head, 1))
  }

  test("global df is the per-shard sum; mixed geometry aligns per shard") {
    val idsA = corpus(20, seed = 161)
    val idsB = corpus(15, seed = 162)
    val a = SparkTestBase.tempDir("graft_fed_df_a")
    val b = SparkTestBase.tempDir("graft_fed_df_b")
    IndexBuilder.build(spark, idsA, a, BuildConfig(chunkDocs = 50))
    IndexBuilder.build(spark, idsB, b, BuildConfig(chunkDocs = 50))
    val fed = new FederatedBm25(spark, Seq(a, b))
    val terms = topTerms(a, 2)
    def dfIn(dir: String, t: String): Long =
      IndexStore.readPostings(spark, dir).collect()
        .filter(_.term == t).map(_.df).sum
    val expected = terms.map(t => t -> (dfIn(a, t) + dfIn(b, t)))
      .filter(_._2 > 0L).toMap
    assert(fed.globalDf(terms) === expected)

    val c = SparkTestBase.tempDir("graft_fed_df_c")
    IndexBuilder.build(spark, idsB, c, BuildConfig(chunkDocs = 40))
    // MIXED geometry is allowed for BM25 federation: shard c lands on a
    // boundary of its OWN 40-doc geometry past shard a's high-water 39
    val mixed = new FederatedBm25(spark, Seq(a, c))
    assert(mixed.offsets === Seq(0L, 40L))
    assert(mixed.globalDf(terms) === expected)
  }

  test("mixed-geometry BM25 federation matches a consolidated index") {
    import spark.implicits._
    val idsA = corpus(20, seed = 163).persist() // 40 docs, ids 0..39
    val idsB = corpus(15, seed = 164).persist() // 30 docs, ids 0..29
    val a = SparkTestBase.tempDir("graft_fed_mix_a")
    val b = SparkTestBase.tempDir("graft_fed_mix_b")
    val cons = SparkTestBase.tempDir("graft_fed_mix_cons")
    IndexBuilder.build(spark, idsA, a, BuildConfig(chunkDocs = 50))
    IndexBuilder.build(spark, idsB, b, BuildConfig(chunkDocs = 40))
    val fed = new FederatedBm25(spark, Seq(a, b))
    assert(fed.offsets === Seq(0L, 40L),
      "shard b must align to its own 40-doc geometry past high-water 39")

    // consolidated truth over the SAME global docId space: BM25 with
    // global stats is chunk-layout independent, so any geometry works
    IndexBuilder.build(spark,
      idsA.unionByName(idsB.map(d => d.copy(docId = d.docId + 40L))),
      cons, BuildConfig(chunkDocs = 40))
    val one = new Bm25Engine(spark, cons)
    val ts = (topTerms(a, 2) ++ topTerms(b, 1)).distinct
    Seq(Bm25Engine.Or, Bm25Engine.And).foreach { mode =>
      assert(fed.searchTerms(ts, 30, mode) === one.searchTerms(ts, 30, mode),
        s"mode $mode")
    }
    assert(fed.searchTermsQl(ts, 30) === one.searchTermsQl(ts, 30))

    idsA.unpersist(); idsB.unpersist()
  }

  test("mixed layout fold rule: 500-trial property sweep of the invariants") {
    import graft.engine.Federation
    val rnd = new scala.util.Random(20260821L)
    (1 to 500).foreach { trial =>
      val k = 1 + rnd.nextInt(6)
      val highs = Seq.fill(k)(rnd.nextInt(5000).toLong)       // shard max docIds
      val cds = Seq.fill(k)(1L + rnd.nextInt(400))             // geometries
      val (offs, bases) = Federation.layoutFromHighs(highs, cds)
      assert(offs.head === 0L && bases.head === 0L, s"t$trial")
      var prevEnd = -1L      // global docId extent of shards placed so far
      var prevChunkEnd = -1L // last global chunk id placed so far
      offs.lazyZip(bases).lazyZip(highs).lazyZip(cds).foreach {
        case (off, base, h, cd) =>
          // offset on the shard's OWN chunk boundary, strictly past every
          // prior shard's extent => global docId spaces disjoint
          assert(off % cd === 0L, s"t$trial: off=$off not aligned to cd=$cd")
          assert(off > prevEnd, s"t$trial: off=$off overlaps extent $prevEnd")
          // chunk base strictly past every prior shard's last global
          // chunk => (shard asc, local chunk asc) == global chunk asc,
          // collision-free
          assert(base > prevChunkEnd,
            s"t$trial: base=$base collides with chunk $prevChunkEnd")
          prevEnd = off + h
          prevChunkEnd = base + h / cd // the shard's last global chunk
      }
      // homogeneous fleet: bases must equal offsets/chunkDocs EXACTLY
      // (the consolidated merged index's own docId -> chunk map)
      val cd0 = cds.head
      val (offsH, basesH) = Federation.layoutFromHighs(highs, Seq.fill(k)(cd0))
      assert(basesH === offsH.map(_ / cd0), s"t$trial homogeneous")
    }
  }

  test("scatter is re-entrant: nested scatters run inline, never deadlock the pool") {
    import graft.engine.Federation
    // more outer tasks than pool threads, each issuing a NESTED scatter:
    // without the inline-on-scatter-thread guard every pool thread parks
    // awaiting nested futures that can never be scheduled — a deadlock.
    // The sys-prop timeout turns a regression into a loud failure
    // instead of a hung suite.
    val prev = sys.props.get("graft.fed.scatter.timeout.sec")
    sys.props("graft.fed.scatter.timeout.sec") = "120"
    try {
      val k = Federation.scatterThreads + 4
      val outer = Federation.scatter((1 to k).map(i => () =>
        Federation.scatter(Seq(() => i * 2, () => i * 2 + 1)).sum))
      assert(outer === (1 to k).map(i => 4 * i + 1))
    } finally {
      prev match {
        case Some(v) => sys.props("graft.fed.scatter.timeout.sec") = v
        case None => sys.props.remove("graft.fed.scatter.timeout.sec")
      }
    }
  }

  /** The oracle twin of mixed-geometry RefScore federation: each shard's
    * chunks ranked single-threaded with that shard's OWN capacity
    * (RefOracle.chunkContexts + the frozen RefRanker kernel), remapped
    * into the global (chunk, docId) space with the SAME fold rule
    * (replicated arithmetic, not the engine's), and ONE insertion merge
    * in ascending global chunk order.
    */
  private def oracleFedMixed(shardDocs: Seq[(Seq[graft.index.IdDoc], Long)],
                             query: String, topK: Int = 30)
      : Seq[graft.rank.DocScore] = {
    val (astOpt, flat) = graft.query.QueryParser.parseQuery(query)
    astOpt match {
      case None => Seq.empty
      case Some(ast) =>
        // fold rule, replicated: offsets on each shard's own chunk
        // boundary past the running high-water; chunk bases cumulative
        var cursor = -1L
        var chunkBase = 0L
        val perChunk = shardDocs.flatMap { case (docs, cd) =>
          val high = docs.map(_.docId).max
          val off = if (cursor < 0) 0L else (cursor / cd + 1L) * cd
          val base = chunkBase
          cursor = math.max(cursor, off + high)
          chunkBase += high / cd + 1L
          graft.oracle.RefOracle.chunkContexts(docs, cd, flat.distinct)
            .map { ctx =>
              (base + ctx.chunk,
                graft.rank.RefRanker.rankChunk(ast, flat, ctx, topK)
                  .map(ds => ds.copy(docId = ds.docId + off)))
            }
        }.sortBy(_._1)
        graft.rank.RefRanker.mergeChunkResults(perChunk, topK)
          .filter(_.url.nonEmpty).toSeq
    }
  }

  test("mixed-geometry RefScore federation == oracle per-shard fold") {
    import spark.implicits._
    val idsA = corpus(60, seed = 181).persist() // 120 docs, cd 50
    val idsB = corpus(40, seed = 182).persist() // 80 docs, cd 30
    val a = SparkTestBase.tempDir("graft_fedrm_a")
    val b = SparkTestBase.tempDir("graft_fedrm_b")
    IndexBuilder.build(spark, idsA, a, BuildConfig(chunkDocs = 50))
    IndexBuilder.build(spark, idsB, b, BuildConfig(chunkDocs = 30))

    val fed = new FederatedSearch(spark, Seq(a, b))
    // B aligns to its OWN 30-doc geometry past A's high-water 119
    assert(fed.offsets === Seq(0L, 120L))
    val docsA = idsA.collect().toSeq
    val docsB = idsB.collect().toSeq
    val shardDocs = Seq((docsA, 50L), (docsB, 30L))

    val ts = topTerms(a, 3)
    val queries = Seq(
      ts.head,
      s"${ts(0)} ${ts(1)}",
      s"${ts(0)} OR ${ts(1)}",
      s"(${ts(0)} OR ${ts(1)}) ${ts(2)}")
    queries.foreach { q =>
      assert(fed.search(q) === oracleFedMixed(shardDocs, q),
        s"mixed-geometry RefScore divergence for query <$q>")
    }

    // the STAGED gather must agree on a mixed fleet too: the global
    // chunk remap feeds the census + executor prune (broadcastDocsLimit
    // 0 forces the cogroup plan so staging can engage at threshold 0)
    val staged = new FederatedSearch(spark, Seq(a, b),
      stagedChunkThreshold = 0, broadcastDocsLimit = 0L)
    val plainTop = fed.search(ts.head)
    assert(staged.search(ts.head) === plainTop)
    assert(staged.lastGatherStaged, "staged gather must engage on the mixed fleet")

    // CROSS-SHARD DUP dedup order: shard B' = shard A's corpus verbatim
    // (identical urls), so the insertion fold must drop every shard-B'
    // twin in (shard asc, chunk asc) arrival order — exactly what the
    // oracle fold replays
    val b2 = SparkTestBase.tempDir("graft_fedrm_b2")
    IndexBuilder.build(spark, idsA, b2, BuildConfig(chunkDocs = 30))
    val fedDup = new FederatedSearch(spark, Seq(a, b2))
    queries.foreach { q =>
      assert(fedDup.search(q) ===
        oracleFedMixed(Seq((docsA, 50L), (docsA, 30L)), q),
        s"cross-shard-dup mixed federation divergence for query <$q>")
    }
    idsA.unpersist(); idsB.unpersist()
  }
}
