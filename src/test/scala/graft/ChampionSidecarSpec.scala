package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.corpus.Corpus
import graft.engine.Bm25Engine
import graft.index.{ChampionSidecar, IndexBuilder, IndexStore}

/** Persisted champion-list sidecar (index.ChampionSidecar): the
  * sidecar-backed champion query must stay ROW-IDENTICAL to the inline
  * per-blob recompute across the full maintenance lifecycle — build,
  * append (stale tail + refresh), markDeleted, compact (the onCompact
  * repair hook) — plus the PartitionFilters pruning evidence and the
  * exact-prefix / fallback contracts. Twin indexes (one with the
  * sidecar, one without) keep the inline truth honest: every
  * maintenance op is applied to both.
  */
class ChampionSidecarSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import IndexBuilder.BuildConfig

  private val cfg = BuildConfig(chunkDocs = 40)

  private def corpus(n: Int, seed: Long) = {
    val docs = Corpus.synthetic(spark, 2, n, seed = seed)
    Corpus.assignDocIds(spark, docs)
  }

  private def topTerms(dir: String, n: Int): Seq[String] =
    IndexStore.readPostings(spark, dir).collect()
      .filterNot(_.term.startsWith("#"))
      .groupBy(_.term).map { case (t, rs) => (t, rs.map(_.tf).sum) }
      .toSeq.sortBy { case (t, tf) => (-tf, t) }.take(n).map(_._1)

  private def champ(dir: String, terms: Seq[String], k: Int, m: Int) =
    new Bm25Engine(spark, dir).searchTermsChampion(terms, k, m)

  test("lifecycle: sidecar-backed champion == inline recompute at every stage") {
    import spark.implicits._
    val ids = corpus(80, seed = 201).persist() // 160 docs, 4 chunks
    val plainDir = SparkTestBase.tempDir("graft_champ_plain")
    val sideDir = SparkTestBase.tempDir("graft_champ_side")
    val half = 99L
    Seq(plainDir, sideDir).foreach { d =>
      IndexBuilder.build(spark, ids.filter(_.docId <= half), d, cfg)
    }
    ChampionSidecar.build(spark, sideDir, m = 8, nBuckets = 8)
    val terms = topTerms(plainDir, 3)

    def assertIdentical(stage: String): Unit =
      Seq((terms.take(1), 10, 4), (terms, 10, 8), (terms.take(2), 5, 2))
        .foreach { case (ts, k, m) =>
          assert(champ(sideDir, ts, k, m) === champ(plainDir, ts, k, m),
            s"[$stage] terms=$ts k=$k m=$m")
        }

    assertIdentical("fresh build")

    // m' > built m: exact inline fallback
    assert(champ(sideDir, terms, 10, 16) === champ(plainDir, terms, 10, 16),
      "m beyond the built prefix must fall back to inline recompute")

    // APPEND, no refresh: the tail (incl. the grown boundary chunk) is
    // recomputed inline at probe time — still identical
    Seq(plainDir, sideDir).foreach { d =>
      IndexBuilder.appendBuild(spark, ids.filter(_.docId > half), d, cfg)
    }
    assertIdentical("appended, stale sidecar")

    // refresh folds the tail in; meta moves to the new high-water
    ChampionSidecar.refresh(spark, sideDir)
    val (_, _, builtDocMax, covered) = ChampionSidecar.readMeta(spark, sideDir)
    assert(builtDocMax === 159L, s"refresh must advance builtDocMax: $builtDocMax")
    assert(covered >= 3L, s"4-chunk index: covered=$covered")
    assertIdentical("appended, refreshed")

    // markDeleted: postings untouched -> champions unchanged
    IndexBuilder.markDeleted(spark, plainDir,
      ids.filter(_.docId % 5 == 2).map(_.docId))
    IndexBuilder.markDeleted(spark, sideDir,
      ids.filter(_.docId % 5 == 2).map(_.docId))
    assertIdentical("tombstoned")

    // COMPACT rewrites chunks: the onCompact hook must repair exactly
    // the affected prefixes (meta-first) and stay identical
    IndexBuilder.compact(spark, plainDir)
    IndexBuilder.compact(spark, sideDir)
    assert(ChampionSidecar.exists(spark, sideDir),
      "onCompact must re-enable the sidecar after the repair")
    assertIdentical("compacted")
    ids.unpersist()
  }

  test("probe prunes on bucket partitions and misses nothing") {
    val ids = corpus(50, seed = 202)
    val dir = SparkTestBase.tempDir("graft_champ_pf")
    IndexBuilder.build(spark, ids, dir, cfg)
    ChampionSidecar.build(spark, dir, m = 8, nBuckets = 8)
    val t = topTerms(dir, 1)
    val frame = ChampionSidecar.candidateFrame(spark, dir, t, 8).get
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("bucket"), pf)
    val qb = ChampionSidecar.bucketScalar(t.head, 8)
    assert(pf.contains(qb.toString), pf)
    // and the pruned frame still carries the term's full prefix set
    assert(frame.filter(col("term") === t.head).count() > 0)
  }

  test("seeded random maintenance lifecycle: sidecar stays row-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260821L)
    val ids = corpus(120, seed = 204).persist() // 240 docs
    val plainDir = SparkTestBase.tempDir("graft_champ_life_p")
    val sideDir = SparkTestBase.tempDir("graft_champ_life_s")
    var high = 79L
    Seq(plainDir, sideDir).foreach { d =>
      IndexBuilder.build(spark, ids.filter(_.docId <= high), d, cfg)
    }
    ChampionSidecar.build(spark, sideDir, m = 6, nBuckets = 8)
    val terms = topTerms(plainDir, 3)

    def check(stage: String): Unit =
      Seq((terms, 10, 6), (terms.take(2), 8, 3)).foreach { case (ts, k, m) =>
        assert(champ(sideDir, ts, k, m) === champ(plainDir, ts, k, m),
          s"[$stage] ts=$ts k=$k m=$m")
      }

    check("init")
    // deterministic op SCHEDULE (random magnitudes): guarantees the
    // append→delete→compact-WITHOUT-refresh sequence — the case where
    // onCompact stamping fresh coverage watermarks would erase the
    // staleness signal and serve pre-append boundary prefixes as fresh —
    // plus compact-after-refresh, repeated compacts, and a second
    // stale-tail round. A free random draw (the first version of this
    // test) never hit compact at all with this seed.
    val schedule = Seq("append", "delete", "compact", "delete", "compact",
      "refresh", "append", "delete", "compact")
    schedule.zipWithIndex.foreach { case (op, i) =>
      val step = i + 1
      val stage = op match {
        case "append" if high < 239L =>
          val take = 20L + rnd.nextInt(60)
          val hi = math.min(high + take, 239L)
          Seq(plainDir, sideDir).foreach { d =>
            IndexBuilder.appendBuild(spark,
              ids.filter(x => x.docId > high && x.docId <= hi), d, cfg)
          }
          high = hi
          s"append->$hi"
        case "delete" =>
          val mod = 3 + rnd.nextInt(5)
          val r = rnd.nextInt(mod)
          Seq(plainDir, sideDir).foreach { d =>
            IndexBuilder.markDeleted(spark, d,
              ids.filter(x => x.docId <= high && x.docId % mod == r)
                .map(_.docId))
          }
          s"delete mod=$mod r=$r"
        case "compact" => // hook repairs the sidecar, meta-first
          Seq(plainDir, sideDir).foreach(d => IndexBuilder.compact(spark, d))
          "compact"
        case _ => // explicit refresh (no-op when fresh)
          ChampionSidecar.refresh(spark, sideDir)
          "refresh"
      }
      check(s"step$step:$stage")
    }
    ids.unpersist()
  }

  test("re-tune rebuild over an existing sidecar: one engine sees the new geometry") {
    val ids = corpus(60, seed = 205)
    val plainDir = SparkTestBase.tempDir("graft_champ_retune_p")
    val sideDir = SparkTestBase.tempDir("graft_champ_retune_s")
    Seq(plainDir, sideDir).foreach(d => IndexBuilder.build(spark, ids, d, cfg))
    ChampionSidecar.build(spark, sideDir, m = 4, nBuckets = 8)
    val terms = topTerms(plainDir, 3)
    // ONE long-lived engine across the rebuild: its meta cache keys on
    // the meta dir's CONTENT fingerprint, so the re-tune (different m
    // AND a different bucket routing) must be picked up without an
    // engine rebuild — a stale cached (m=4, nBuckets=8) here would
    // probe the wrong bucket partitions and silently miss candidates
    val engine = new Bm25Engine(spark, sideDir)
    assert(engine.searchTermsChampion(terms, 10, 4) ===
      champ(plainDir, terms, 10, 4), "pre-rebuild")
    ChampionSidecar.build(spark, sideDir, m = 8, nBuckets = 2)
    val (nb, m, _, _) = ChampionSidecar.readMeta(spark, sideDir)
    assert((nb, m) === ((2, 8)), "rebuild must stamp the new geometry")
    Seq(4, 8).foreach { mm =>
      assert(engine.searchTermsChampion(terms, 10, mm) ===
        champ(plainDir, terms, 10, mm), s"post-rebuild m=$mm")
    }
  }

  test("champion store emptied by compact: inline fallback, never a throw") {
    import spark.implicits._
    val ids = corpus(40, seed = 206).persist() // 80 docs, 2 chunks at cd=40
    val plainDir = SparkTestBase.tempDir("graft_champ_empty_p")
    val sideDir = SparkTestBase.tempDir("graft_champ_empty_s")
    // build over chunk 0 only, sidecar covers exactly that chunk
    Seq(plainDir, sideDir).foreach { d =>
      IndexBuilder.build(spark, ids.filter(_.docId <= 39L), d, cfg)
    }
    ChampionSidecar.build(spark, sideDir, m = 4, nBuckets = 4)
    val terms = topTerms(plainDir, 2)
    // append chunk 1 (sidecar left stale), then tombstone ALL of chunk 0
    // and compact: every COVERED chunk empties, so onCompact removes
    // every chunk dir and the store keeps meta but zero parquet data
    // files — the probe must treat that as "cannot answer" (inline
    // fallback), not die on schema inference
    Seq(plainDir, sideDir).foreach { d =>
      IndexBuilder.appendBuild(spark, ids.filter(_.docId > 39L), d, cfg)
      IndexBuilder.markDeleted(spark, d,
        ids.filter(_.docId <= 39L).map(_.docId))
      IndexBuilder.compact(spark, d)
    }
    assert(ChampionSidecar.exists(spark, sideDir),
      "meta survives (old watermarks) — the data store is what emptied")
    assert(ChampionSidecar.candidateFrame(spark, sideDir, terms, 4).isEmpty,
      "an empty champion store must report 'cannot answer', not throw")
    assert(champ(sideDir, terms, 10, 4) === champ(plainDir, terms, 10, 4))
    ids.unpersist()
  }

  test("missing meta disables the sidecar: exact inline fallback") {
    val ids = corpus(40, seed = 203)
    val plainDir = SparkTestBase.tempDir("graft_champ_nometa_p")
    val sideDir = SparkTestBase.tempDir("graft_champ_nometa_s")
    Seq(plainDir, sideDir).foreach(d => IndexBuilder.build(spark, ids, d, cfg))
    ChampionSidecar.build(spark, sideDir, m = 4, nBuckets = 4)
    // simulate a repair that died mid-way: meta gone, data half-there
    def rmTree(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles().foreach(c => rmTree(c.getPath))
      f.delete(); ()
    }
    rmTree(ChampionSidecar.champMetaDir(sideDir))
    rmTree(ChampionSidecar.champDir(sideDir) + "/chunk=0")
    val terms = topTerms(plainDir, 2)
    assert(champ(sideDir, terms, 10, 4) === champ(plainDir, terms, 10, 4))
  }
}
