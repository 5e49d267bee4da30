package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.engine.{Bm25Engine, FederatedBm25}
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

  test("global df is the per-shard sum; mixed chunk geometry is rejected") {
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
    val ex = intercept[IllegalArgumentException] {
      new FederatedBm25(spark, Seq(a, c)).corpusStats
    }
    assert(ex.getMessage.contains("chunk geometry"))
  }
}
