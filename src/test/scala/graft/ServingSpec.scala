package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.engine.{Bm25Engine, Bm25Serving}
import graft.index.{IndexBuilder, IndexStore}

/** Serving-layer cache + hot reload (engine.Bm25Serving): memoized repeat
  * queries, lineage/tombstone version-token invalidation across the full
  * maintenance lifecycle (append → delete → compact), the stale fast
  * path, and concurrent-query smoke.
  */
class ServingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import IndexBuilder.BuildConfig

  private def corpus(filesPerRepo: Int, seed: Long) = {
    val docs = Corpus.synthetic(spark, 2, filesPerRepo, seed = seed)
    Corpus.assignDocIds(spark, docs)
  }

  private def topTerm(dir: String): String =
    IndexStore.readPostings(spark, dir).collect()
      .filterNot(_.term.startsWith("#"))
      .groupBy(_.term).map { case (t, rs) => (t, rs.map(_.df).sum) }
      .toSeq.minBy { case (t, df) => (-df, t) }._1

  test("repeat query hits the cache; maintenance lifecycle reloads the engine") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val ids = corpus(60, seed = 191).persist() // 120 docs
    val dir = SparkTestBase.tempDir("graft_serv")
    val half = 59L
    IndexBuilder.build(spark, ids.filter(_.docId <= half), dir, cfg)

    val serving = new Bm25Serving(spark, dir)
    val t = topTerm(dir)
    val r1 = serving.searchTerms(Seq(t), 10)
    val r2 = serving.searchTerms(Seq(t), 10)
    assert(r1 === r2)
    assert(serving.stats === ((1L, 1L, 0L)), "expected one hit, one miss, no reload")

    // APPEND moves the lineage token: reload + fresh results
    IndexBuilder.appendBuild(spark, ids.filter(_.docId > half), dir, cfg)
    val r3 = serving.searchTerms(Seq(t), 10)
    assert(serving.stats._3 === 1L, "append must trigger a reload")
    assert(r3 === new Bm25Engine(spark, dir).searchTerms(Seq(t), 10))

    // DELETE moves the tombstone token (postings unchanged -> same hits)
    IndexBuilder.markDeleted(spark, dir, ids.filter(_.docId % 7 == 3).map(_.docId))
    val r4 = serving.searchTerms(Seq(t), 10)
    assert(serving.stats._3 === 2L, "markDeleted must trigger a reload")
    assert(r4 === r3, "pending tombstones do not change postings")

    // COMPACT rewrites partitions: a STALE engine's cached scans would
    // fail or lie — the reload serves the purged truth
    IndexBuilder.compact(spark, dir)
    val r5 = serving.searchTerms(Seq(t), 10)
    assert(serving.stats._3 === 3L, "compact must trigger a reload")
    assert(r5 === new Bm25Engine(spark, dir).searchTerms(Seq(t), 10))
    val purged = ids.filter(_.docId % 7 == 3).map(_.docId).collect().toSet
    assert(r5.forall(h => !purged.contains(h.docId)))
    ids.unpersist()
  }

  test("serving memoizes the whole ranked-retrieval family; keys never alias") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val ids = corpus(40, seed = 199).persist() // 80 docs
    val dir = SparkTestBase.tempDir("graft_serv_family")
    IndexBuilder.build(spark, ids.filter(_.docId <= 39L), dir, cfg)
    val serving = new Bm25Serving(spark, dir)
    val ts = IndexStore.readPostings(spark, dir).collect()
      .filterNot(_.term.startsWith("#"))
      .groupBy(_.term).map { case (t, rs) => (t, rs.map(_.df).sum) }
      .toSeq.sortBy { case (t, df) => (-df, t) }.take(2).map(_._1)

    val f1 = serving.searchTermsFielded(ts, 10)
    assert(serving.searchTermsFielded(ts, 10) === f1, "fielded repeat must hit")
    val c1 = serving.searchTermsChampion(ts, 10, m = 8)
    val p1 = serving.searchTermsProximity(ts, 10)
    val q1 = serving.searchTermsQl(ts, 10)
    val fc1 = serving.searchTermsFieldedChampion(ts, 10, m = 8)
    val pc1 = serving.searchTermsProximityChampion(ts, 10, m = 8)
    // six distinct methods over ONE term set = six distinct keys (plus
    // the one fielded hit); a method tag collision would read a wrong
    // ranker's hits here
    assert(serving.stats === ((1L, 6L, 0L)))
    // a changed scoring parameter splits the key
    serving.searchTermsChampion(ts, 10, m = 4)
    assert(serving.stats._2 === 7L, "m=4 must not alias the m=8 row")
    // term order canonicalizes: reversed query is a HIT on the same row
    assert(serving.searchTermsProximity(ts.reverse, 10) === p1)
    assert(serving.stats._1 === 2L, "reversed term order must hit")
    // every cached family matches a fresh engine at the canonical order
    val e = new Bm25Engine(spark, dir)
    val canon = ts.distinct.sorted
    assert(f1 === e.searchTermsFielded(canon, 10))
    assert(c1 === e.searchTermsChampion(canon, 10, 8))
    assert(p1 === e.searchTermsProximity(canon, 10))
    assert(q1 === e.searchTermsQl(canon, 10))
    assert(fc1 === e.searchTermsFieldedChampion(canon, 10, 8))
    assert(pc1 === e.searchTermsProximityChampion(canon, 10, 8))
    // maintenance reloads ONE generation for the whole family
    IndexBuilder.appendBuild(spark, ids.filter(_.docId > 39L), dir, cfg)
    val f2 = serving.searchTermsFielded(ts, 10)
    assert(serving.stats._3 === 1L, "append must reload")
    assert(f2 === new Bm25Engine(spark, dir).searchTermsFielded(canon, 10))
    ids.unpersist()
  }

  test("checkVersion = false serves the cached generation unchanged") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val ids = corpus(40, seed = 192).persist() // 80 docs
    val dir = SparkTestBase.tempDir("graft_serv_fast")
    IndexBuilder.build(spark, ids.filter(_.docId <= 39L), dir, cfg)
    val serving = new Bm25Serving(spark, dir)
    val t = topTerm(dir)
    val r1 = serving.searchTerms(Seq(t), 10)
    IndexBuilder.appendBuild(spark, ids.filter(_.docId > 39L), dir, cfg)
    // fast path: no probe, stale-but-consistent answer from the cache
    val fast = serving.searchTerms(Seq(t), 10, checkVersion = false)
    assert(fast === r1)
    assert(serving.stats._3 === 0L)
    // next checked query reloads
    val checked = serving.searchTerms(Seq(t), 10)
    assert(serving.stats._3 === 1L)
    assert(checked === new Bm25Engine(spark, dir).searchTerms(Seq(t), 10))
    ids.unpersist()
  }

  test("RefServing: repeat query cached; maintenance lifecycle reloads") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val ids = corpus(60, seed = 194).persist() // 120 docs
    val dir = SparkTestBase.tempDir("graft_serv_ref")
    val half = 59L
    IndexBuilder.build(spark, ids.filter(_.docId <= half), dir, cfg)

    val serving = new graft.engine.RefServing(spark, dir)
    val q = topTerm(dir)
    val r1 = serving.search(q)
    val r2 = serving.search(q)
    assert(r1 === r2)
    assert(serving.stats === ((1L, 1L, 0L)))

    IndexBuilder.appendBuild(spark, ids.filter(_.docId > half), dir, cfg)
    val r3 = serving.search(q)
    assert(serving.stats._3 === 1L, "append must trigger a reload")
    assert(r3 === new graft.engine.SearchEngine(spark, dir, 50).search(q))

    IndexBuilder.markDeleted(spark, dir,
      ids.filter(_.docId % 7 == 3).map(_.docId))
    serving.search(q)
    assert(serving.stats._3 === 2L, "markDeleted must trigger a reload")

    IndexBuilder.compact(spark, dir)
    val r5 = serving.search(q)
    assert(serving.stats._3 === 3L, "compact must trigger a reload")
    assert(r5 === new graft.engine.SearchEngine(spark, dir, 50).search(q))
    ids.unpersist()
  }

  test("FederatedBm25Serving: cache + any-shard reload, results match fresh") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val ids = corpus(60, seed = 196).persist() // 120 docs
    val dirA = SparkTestBase.tempDir("graft_serv_fbA")
    val dirB = SparkTestBase.tempDir("graft_serv_fbB")
    IndexBuilder.build(spark, ids.filter(_.docId <= 49L), dirA, cfg)
    IndexBuilder.build(spark, ids.filter(d => d.docId > 49L && d.docId <= 99L)
      .map(d => d.copy(docId = d.docId - 50L)), dirB, cfg)

    val serving = new graft.engine.FederatedBm25Serving(spark, Seq(dirA, dirB))
    val t = topTerm(dirA)
    val r1 = serving.searchTerms(Seq(t), 10)
    assert(serving.searchTerms(Seq(t), 10) === r1)
    assert(serving.stats === ((1L, 1L, 0L)))
    assert(r1 === new graft.engine.FederatedBm25(spark, Seq(dirA, dirB))
      .searchTerms(Seq(t), 10))

    // QL rides the same cache + token: distinct key, cached repeat,
    // fresh-engine truth
    val ql1 = serving.searchTermsQl(Seq(t), 10)
    assert(serving.searchTermsQl(Seq(t), 10) === ql1)
    assert(ql1 === new graft.engine.FederatedBm25(spark, Seq(dirA, dirB))
      .searchTermsQl(Seq(t), 10))

    IndexBuilder.appendBuild(spark,
      ids.filter(_.docId > 99L).map(d => d.copy(docId = d.docId - 50L)),
      dirB, cfg)
    val r2 = serving.searchTerms(Seq(t), 10)
    assert(serving.stats._3 === 1L, "shard-B append must reload the federation")
    assert(r2 === new graft.engine.FederatedBm25(spark, Seq(dirA, dirB))
      .searchTerms(Seq(t), 10))
    assert(serving.searchTermsQl(Seq(t), 10) ===
      new graft.engine.FederatedBm25(spark, Seq(dirA, dirB))
        .searchTermsQl(Seq(t), 10), "post-reload QL must see the new shard")
    ids.unpersist()
  }

  test("FederatedRefServing: any shard's maintenance reloads the federation") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val ids = corpus(60, seed = 195).persist() // 120 docs
    val dirA = SparkTestBase.tempDir("graft_serv_fedA")
    val dirB = SparkTestBase.tempDir("graft_serv_fedB")
    IndexBuilder.build(spark, ids.filter(_.docId <= 49L), dirA, cfg)
    IndexBuilder.build(spark, ids.filter(d => d.docId > 49L && d.docId <= 99L)
      .map(d => d.copy(docId = d.docId - 50L)), dirB, cfg)

    val serving = new graft.engine.FederatedRefServing(spark, Seq(dirA, dirB))
    val q = topTerm(dirA)
    val r1 = serving.search(q)
    assert(serving.search(q) === r1)
    assert(serving.stats === ((1L, 1L, 0L)))

    // append to shard B only: the federated token must move
    IndexBuilder.appendBuild(spark,
      ids.filter(_.docId > 99L).map(d => d.copy(docId = d.docId - 50L)),
      dirB, cfg)
    val r2 = serving.search(q)
    assert(serving.stats._3 === 1L, "shard-B append must reload the federation")
    assert(r2 ===
      new graft.engine.FederatedSearch(spark, Seq(dirA, dirB)).search(q))
    ids.unpersist()
  }

  test("version-token order is strict lexicographic: swaps only move forward") {
    val newer = Bm25Serving.isNewer _
    // lineage advance always wins, whatever the tombstone count does
    assert(newer((2L, 0L), (1L, 5L)))
    assert(!newer((1L, 5L), (2L, 0L)))
    // at fixed lineage, tombstone accumulation is forward
    assert(newer((3L, 4L), (3L, 1L)))
    assert(!newer((3L, 1L), (3L, 4L)))
    // equal tokens are not newer (re-entrant probe must not re-swap)
    assert(!newer((3L, 4L), (3L, 4L)))
  }

  /** Spark jobs started while `f` runs (listener-bus events are async,
    * so poll until the count is stable). The positive control below
    * proves delivery on this bus before any zero-assertion is trusted.
    */
  private def jobsDuring(f: => Unit): Long = {
    val counter = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 5 && waited < 100) { // stable for 0.5 s, cap 10 s
        Thread.sleep(100)
        waited += 1
        if (counter.get() == last) stable += 1 else { stable = 0; last = counter.get() }
      }
      counter.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("checked cache hit runs ZERO Spark jobs (FS-listing version probe)") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val ids = corpus(30, seed = 197)
    val dir = SparkTestBase.tempDir("graft_serv_nojob")
    IndexBuilder.build(spark, ids, dir, cfg)
    val serving = new Bm25Serving(spark, dir)
    val t = topTerm(dir)
    // positive control: the miss computes through Spark — the listener
    // must see its jobs, or a zero below would be vacuous
    assert(jobsDuring { serving.searchTerms(Seq(t), 10) } > 0L,
      "listener failed to observe the cache-miss jobs")
    // the reference's servers answer repeat queries with zero freshness
    // cost (immutable mmap, index/indexServer.cpp:70-91); the FS-listing
    // token gives the mutable index the same property: a CHECKED hit is
    // two driver-side listings, no job
    assert(jobsDuring { serving.searchTerms(Seq(t), 10) } === 0L,
      "a checked cache hit must not launch Spark jobs")
    assert(serving.stats._3 === 0L)
  }

  test("LRU result cache: a hot key touched between fills survives the bound") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val ids = corpus(30, seed = 198)
    val dir = SparkTestBase.tempDir("graft_serv_lru")
    IndexBuilder.build(spark, ids, dir, cfg)
    val serving = new Bm25Serving(spark, dir, maxEntries = 3)
    val ts = IndexStore.readPostings(spark, dir).collect()
      .filterNot(_.term.startsWith("#"))
      .groupBy(_.term).map { case (t, rs) => (t, rs.map(_.df).sum) }
      .toSeq.sortBy { case (t, df) => (-df, t) }.take(5).map(_._1)
    val hot = ts.head
    serving.searchTerms(Seq(hot), 10) // miss: hot enters
    // fill past the bound, touching the hot key between fills — under
    // access-ordered eviction the cold fills evict each other, never hot
    ts.drop(1).foreach { cold =>
      serving.searchTerms(Seq(cold), 10) // miss
      serving.searchTerms(Seq(hot), 10)  // hit, refreshes hot's recency
    }
    val (hits, misses, _) = serving.stats
    assert(misses === 5L, "each distinct key computes exactly once")
    assert(hits === 4L, "the hot key must hit on every revisit " +
      "(clear-all would have dumped it with the working set)")
  }

  test("concurrent identical queries: one engine generation, identical results") {
    val cfg = BuildConfig(chunkDocs = 50)
    val ids = corpus(30, seed = 193)
    val dir = SparkTestBase.tempDir("graft_serv_conc")
    IndexBuilder.build(spark, ids, dir, cfg)
    val serving = new Bm25Serving(spark, dir)
    val t = topTerm(dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val rs = Await.result(
      Future.sequence((1 to 8).map(_ => Future(serving.searchTerms(Seq(t), 10)))),
      2.minutes)
    assert(rs.distinct.size === 1)
    assert(serving.stats._3 === 0L)
  }
}
