package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.engine.{Bm25Engine, SearchEngine}
import graft.index.{BloomSidecar, IndexBuilder, IndexStore}

/** Bloom chunk-skip sidecar: scalar/Column hash identity, the
  * no-false-negative contract (candidates ⊇ truly-qualifying chunks,
  * both all-terms and any-term), and full rank-identity of BOTH engines
  * with the sidecar active on the big-index path — plus the
  * empty-candidates early return for absent terms.
  */
class BloomSidecarSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** One shared sf0.001 index (6 chunks) with a sidecar built on it. */
  lazy val idx: String = {
    val out = SparkTestBase.tempDir("graft-bloom-idx")
    IndexBuilder.build(spark, Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001"),
      out, IndexBuilder.BuildConfig(chunkDocs = 100))
    BloomSidecar.build(spark, out, mBits = 1 << 12, kHashes = 3)
    out
  }

  test("scalar bitPos equals the Column-side cmsCol hash") {
    import spark.implicits._
    val terms = Seq("spark", "merge", "a", "zz", "nineteencharstrings", "#doc")
    val m = 1 << 12
    val got = terms.toDF("term")
      .select(col("term"), explode(sequence(lit(0L), lit(2L))).as("j"))
      .select(col("term"), col("j"),
        graft.analysis.Sketches.cmsCol(col("term"), col("j"), m).as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (t <- terms; j <- 0L to 2L)
      assert(got((t, j)) === BloomSidecar.bitPosScalar(t, j, m), s"($t, $j)")
  }

  test("no false negatives: every (chunk, term) of the postings passes its probe") {
    val ct = IndexStore.readPostings(spark, idx)
      .select(col("chunk"), col("term")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byTerm = ct.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // per-term: candidate set must contain every chunk that has the term
    val sample = byTerm.keys.toSeq.sorted.take(12) ++ Seq("#doc", "#txt")
    sample.filter(byTerm.contains).foreach { t =>
      val cand = BloomSidecar.candidateChunks(spark, idx, Seq(t)).get.toSet
      assert(byTerm(t).subsetOf(cand), s"term '$t'")
    }
    // multi-term AND: chunks holding both ⊆ candidates(all)
    val two = byTerm.keys.toSeq.sorted.take(2)
    if (two.size == 2) {
      val want = byTerm(two.head).intersect(byTerm(two(1)))
      val cand = BloomSidecar.candidateChunks(spark, idx, two).get.toSet
      assert(want.subsetOf(cand))
      // any-term OR: union ⊆ candidates(any)
      val candAny = BloomSidecar.candidateChunks(spark, idx, two,
        requireAll = false).get.toSet
      assert(byTerm(two.head).union(byTerm(two(1))).subsetOf(candAny))
      assert(cand.subsetOf(candAny))
    }
  }

  test("absent term: candidates empty (up to FP) and engines return empty") {
    val cand = BloomSidecar.candidateChunks(spark, idx, Seq("zzqqabsentterm")).get
    // 3 hashes into 4096 bits with ~vocab-sized fill: FP possible in
    // principle; the CONTRACT is only supersetness, but on this corpus
    // the probe should come back empty — if this ever flakes, the term
    // below needs a new unlikely spelling, not a looser assert
    assert(cand.isEmpty)
    val eng = new SearchEngine(spark, idx, 100, broadcastDocsLimit = 0)
    assert(eng.search("zzqqabsentterm").isEmpty)
  }

  test("SearchEngine big-index path is rank-identical with the sidecar active") {
    val queries = Seq("spark merge sort", "\"sort merge\"", "spark OR dup",
      "spark AND dup", "dup", "spark", "spark zzzmissing")
    // broadcastDocsLimit = 0 forces the big-index (chunk-pruned cogroup)
    // path, the one that consults the sidecar
    val withBloom = new SearchEngine(spark, idx, 100, broadcastDocsLimit = 0)
    val plain = {
      val out = SparkTestBase.tempDir("graft-bloom-plainidx")
      IndexBuilder.build(spark,
        Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001"),
        out, IndexBuilder.BuildConfig(chunkDocs = 100))
      new SearchEngine(spark, out, 100, broadcastDocsLimit = 0)
    }
    queries.foreach { q =>
      assert(withBloom.search(q).map(h => (h.url, h.score)) ===
        plain.search(q).map(h => (h.url, h.score)), s"query [$q]")
    }
  }

  /** Seeded IdDoc rows with region-unique marker terms so staleness is
    * observable: docs < splitAt carry "qqzbaseterm", docs >= splitAt
    * carry "qqzdeltaterm" (absent from the base index entirely).
    */
  private def markerDocs(n: Int, splitAt: Long) = {
    import spark.implicits._
    (0 until n).map { i =>
      val marker = if (i < splitAt) "qqzbaseterm" else "qqzdeltaterm"
      graft.index.IdDoc(i.toLong, s"org${i % 7}/proj${i % 7}", s"p/d$i.txt",
        f"c$i%08d", "scala", s"common filler words here $marker again $marker")
    }.toDS()
  }

  private def gridOf(dir: String): Map[(Long, Long), Long] =
    BloomSidecar.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("stale sidecar after appendBuild: no false negatives; refresh == full rebuild") {
    val cfg = IndexBuilder.BuildConfig(chunkDocs = 50)
    val docs = markerDocs(180, splitAt = 120L).persist()
    val dir = SparkTestBase.tempDir("graft-bloom-stale")
    IndexBuilder.build(spark, docs.filter(_.docId < 120L), dir, cfg)
    BloomSidecar.build(spark, dir, mBits = 1 << 14, kHashes = 3)

    val touched = IndexBuilder.appendBuild(
      spark, docs.filter(_.docId >= 120L), dir, cfg)
    assert(touched === Set(2L, 3L)) // chunk 2 extended, chunk 3 new

    // STALE sidecar: the delta-only term lives in chunks {2, 3}; the grid
    // has never seen it, but the staleness guard must admit the tail
    val deltaChunks = IndexStore.readPostings(spark, dir)
      .filter(org.apache.spark.sql.functions.col("term") === "qqzdeltaterm")
      .select("chunk").collect().map(_.getLong(0)).toSet
    assert(deltaChunks === Set(2L, 3L))
    val staleCand = BloomSidecar.candidateChunks(spark, dir, Seq("qqzdeltaterm")).get.toSet
    assert(deltaChunks.subsetOf(staleCand), "stale sidecar dropped a delta chunk")
    // base term spans every chunk (it's in docs 0..119 -> chunks 0..2,
    // and the stale tail is admitted unconditionally)
    val baseCand = BloomSidecar.candidateChunks(spark, dir, Seq("qqzbaseterm")).get.toSet
    assert(Set(0L, 1L, 2L).subsetOf(baseCand))

    // refresh rebuilds ONLY the stale tail; result must equal a full rebuild
    BloomSidecar.refresh(spark, dir)
    val afterRefresh = gridOf(dir)
    BloomSidecar.build(spark, dir, mBits = 1 << 14, kHashes = 3)
    assert(afterRefresh === gridOf(dir), "refresh != from-scratch rebuild")

    // FRESH sidecar now prunes: delta term's candidates exclude chunks 0/1
    // (deterministic hashes — at 2^14 bits / ~5 distinct terms a cross-term
    // collision on all 3 probe bits would be a fixture bug, not flake)
    val freshCand = BloomSidecar.candidateChunks(spark, dir, Seq("qqzdeltaterm")).get.toSet
    assert(deltaChunks.subsetOf(freshCand))
    assert(!freshCand.contains(0L) && !freshCand.contains(1L),
      s"fresh sidecar failed to prune the base chunks: $freshCand")

    // refresh on a fresh sidecar is a no-op (same files, byte for byte)
    def files() = new java.io.File(BloomSidecar.bloomDir(dir)).listFiles()
      .map(f => (f.getName, f.lastModified, f.length)).toSet
    val before = files()
    BloomSidecar.refresh(spark, dir)
    assert(files() === before, "no-op refresh rewrote the sidecar")
    docs.unpersist()
  }

  test("Bm25Engine big-index path is score-identical with the sidecar, And + Or") {
    val withBloom = new Bm25Engine(spark, idx, broadcastDocsLimit = 0)
    val plain = {
      val out = SparkTestBase.tempDir("graft-bloom-plainbm")
      IndexBuilder.build(spark,
        Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001"),
        out, IndexBuilder.BuildConfig(chunkDocs = 100))
      new Bm25Engine(spark, out, broadcastDocsLimit = 0)
    }
    for (and <- Seq(false, true)) {
      val g = withBloom.searchTerms(Seq("spark", "dup"), 10,
          if (and) withBloom.And else withBloom.Or)
        .map(h => (h.docId, h.score))
      val w = plain.searchTerms(Seq("spark", "dup"), 10,
          if (and) plain.And else plain.Or)
        .map(h => (h.docId, h.score))
      assert(g === w, s"and=$and")
    }
  }
}
