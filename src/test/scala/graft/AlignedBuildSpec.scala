package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.index._

/** The "aligned" build strategy: zero-exchange combined build for input
  * whose partitions are already docId-ascending and chunk-aligned (the
  * ingest's own storage order). Pins: (1) blob-identity with bychunk,
  * (2) task-side order enforcement, (3) post-write straddle detection
  * with surgical cleanup, (4) resume equivalence.
  */
class AlignedBuildSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import IndexBuilder.BuildConfig

  /** A Dataset[IdDoc] with EXACTLY the given partitions, in order. */
  private def partitioned(parts: Seq[Seq[IdDoc]]): org.apache.spark.sql.Dataset[IdDoc] = {
    import spark.implicits._
    val local = parts.map(_.toArray).toArray
    spark.createDataset(
      spark.sparkContext.parallelize(local.indices, local.length)
        .flatMap(i => local(i)))
  }

  /** 2*n synthetic docs with dense docIds 0..2n-1, sorted. */
  private def sortedDocs(n: Int, seed: Int): Array[IdDoc] =
    Corpus.assignDocIds(spark, Corpus.synthetic(spark, 2, n, seed = seed))
      .collect().sortBy(_.docId)

  private def canonP(dir: String) = IndexStore.readPostings(spark, dir).collect()
    .map(p => ((p.chunk, p.term), (p.df, p.tf, p.postingsBlob.toSeq))).toMap
  private def canonD(dir: String) = IndexStore.readDocs(spark, dir).collect()
    .map(d => (d.docId, d)).toMap

  private def chunkDirs(out: String): Seq[String] = {
    val d = new java.io.File(IndexBuilder.postingsDir(out))
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("chunk=")).map(_.getName).toSeq
  }

  private def causeChain(t: Throwable): Iterator[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)

  test("aligned build is blob-identical to bychunk (multi-partition, chunk-aligned input)") {
    val docs = sortedDocs(20, seed = 29)
    assert(docs.length === 40)
    val cfg = BuildConfig(chunkDocs = 10, strategy = "aligned")
    // chunk-aligned contiguous splits: chunks 0 | 1,2 | 3 — no straddle
    val ds = partitioned(Seq(docs.slice(0, 10), docs.slice(10, 30), docs.slice(30, 40)))
    val out = SparkTestBase.tempDir("graft-aligned")
    val built = IndexBuilder.build(spark, ds, out, cfg)
    assert(built === Set(0L, 1L, 2L, 3L))
    // combined one-table layout, same as bychunk
    assert(!new java.io.File(IndexBuilder.docsDir(out)).exists())
    val out2 = SparkTestBase.tempDir("graft-aligned-ref")
    IndexBuilder.build(spark, partitioned(Seq(docs.toSeq)).repartition(5), out2,
      BuildConfig(chunkDocs = 10, strategy = "bychunk"))
    assert(canonP(out) === canonP(out2))
    assert(canonD(out) === canonD(out2))
    assert(canonP(out).nonEmpty)
  }

  test("aligned build fails the task on a non-ascending partition") {
    val docs = sortedDocs(20, seed = 31)
    // second partition has a descending pair
    val ds = partitioned(Seq(docs.slice(0, 10),
      Seq(docs(11), docs(10)) ++ docs.slice(12, 20)))
    val out = SparkTestBase.tempDir("graft-aligned-unsorted")
    val e = intercept[Throwable] {
      IndexBuilder.build(spark, ds, out, BuildConfig(chunkDocs = 10, strategy = "aligned"))
    }
    assert(causeChain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("docId-ascending"))),
      s"unexpected failure: $e")
  }

  test("aligned build detects a chunk straddling two partitions and removes its output") {
    val docs = sortedDocs(30, seed = 37)
    // both partitions internally sorted and disjoint, but chunk 1
    // (docIds 10..19) is split across them
    val ds = partitioned(Seq(docs.slice(0, 15), docs.slice(15, 30)))
    val out = SparkTestBase.tempDir("graft-aligned-straddle")
    val e = intercept[IllegalStateException] {
      IndexBuilder.build(spark, ds, out, BuildConfig(chunkDocs = 10, strategy = "aligned"))
    }
    assert(e.getMessage.contains("precondition violated"))
    // every chunk this invocation wrote was removed — a straddled chunk
    // on disk would hold two partial posting sets
    assert(chunkDirs(out).isEmpty, s"leftover chunk dirs: ${chunkDirs(out)}")
    // no lineage was written: the index reports no completed chunks and
    // a follow-up bychunk build from scratch succeeds over the same dir
    assert(IndexBuilder.completedChunks(spark, out, "postings") === Set.empty)
    IndexBuilder.build(spark, partitioned(Seq(docs.toSeq)), out,
      BuildConfig(chunkDocs = 10, strategy = "bychunk"))
    val out2 = SparkTestBase.tempDir("graft-aligned-straddle-ref")
    IndexBuilder.build(spark, partitioned(Seq(docs.toSeq)), out2,
      BuildConfig(chunkDocs = 10, strategy = "bychunk"))
    assert(canonP(out) === canonP(out2))
  }

  test("aligned resume extends a partial aligned index to the from-scratch result") {
    val docs = sortedDocs(20, seed = 41)
    val cfg = BuildConfig(chunkDocs = 10, strategy = "aligned")
    val out = SparkTestBase.tempDir("graft-aligned-resume")
    // first build: chunks 0,1 only
    val first = IndexBuilder.build(spark,
      partitioned(Seq(docs.slice(0, 20).toSeq)), out, cfg)
    assert(first === Set(0L, 1L))
    // resume with the full corpus (pending filter keeps partition order)
    val ds = partitioned(Seq(docs.slice(0, 20), docs.slice(20, 40)))
    assert(IndexBuilder.build(spark, ds, out, cfg) === Set(2L, 3L))
    val out2 = SparkTestBase.tempDir("graft-aligned-resume-ref")
    IndexBuilder.build(spark, partitioned(Seq(docs.toSeq)), out2,
      BuildConfig(chunkDocs = 10, strategy = "bychunk"))
    assert(canonP(out) === canonP(out2))
    assert(canonD(out) === canonD(out2))
  }

  test("seeded sweep: random chunk-aligned splits x geometries stay blob-identical to bychunk") {
    val rnd = new scala.util.Random(97)
    val docs = sortedDocs(30, seed = 47) // 60 docs, ids 0..59
    for (trial <- 1 to 4) {
      val cd = Seq(5L, 10L, 25L)(rnd.nextInt(3))
      val nChunks = (docs.length + cd - 1) / cd
      // random subset of chunk boundaries as partition cuts
      val cuts = (1L until nChunks).filter(_ => rnd.nextBoolean()).map(_ * cd)
      val bounds = (Seq(0L) ++ cuts ++ Seq(docs.length.toLong)).distinct.sorted
      val parts = bounds.zip(bounds.drop(1)).map { case (a, b) =>
        docs.filter(d => d.docId >= a && d.docId < b).toSeq
      }
      val out = SparkTestBase.tempDir(s"graft-aligned-sweep$trial")
      IndexBuilder.build(spark, partitioned(parts), out,
        BuildConfig(chunkDocs = cd, strategy = "aligned"))
      val out2 = SparkTestBase.tempDir(s"graft-aligned-sweep$trial-ref")
      IndexBuilder.build(spark, partitioned(Seq(docs.toSeq)).repartition(4), out2,
        BuildConfig(chunkDocs = cd, strategy = "bychunk"))
      assert(canonP(out) === canonP(out2), s"trial $trial cd=$cd bounds=$bounds")
      assert(canonD(out) === canonD(out2), s"trial $trial cd=$cd bounds=$bounds")
    }
  }

  test("aligned build plan: ZERO Exchange between scan and output rows") {
    val docs = sortedDocs(10, seed = 43)
    val acc = spark.sparkContext.collectionAccumulator[(Long, Long)]("planExtents")
    val plan = IndexBuilder.buildCombinedAligned(
      partitioned(Seq(docs.slice(0, 10), docs.slice(10, 20))),
      BuildConfig(chunkDocs = 10, strategy = "aligned"), acc)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"aligned plan shuffles:\n$plan")
    // and the bychunk twin DOES pay its one exchange (the contrast that
    // makes the aligned claim meaningful)
    val planBy = IndexBuilder.buildCombinedByChunk(
      partitioned(Seq(docs.toSeq)), BuildConfig(chunkDocs = 10))
      .queryExecution.executedPlan.toString
    assert(planBy.contains("Exchange"))
  }

  test("storage round-trip: writeStorageOrdered -> readStorageOrdered -> aligned build == bychunk, zero Exchange") {
    import spark.implicits._
    val docs = sortedDocs(30, seed = 53) // 60 docs
    val dir = SparkTestBase.tempDir("graft-storage")
    // write from an ARBITRARY partitioning — the writer owns the ordering
    Corpus.writeStorageOrdered(
      spark.createDataset(docs.toSeq).repartition(5), dir,
      chunkDocs = 10, blockChunks = 2)
    val back = Corpus.readStorageOrdered(spark, dir)
    // read-back is row-identical to the source
    assert(back.collect().map(d => (d.docId, d)).toMap ===
      docs.map(d => (d.docId, d)).toMap)
    // the whole pipeline read -> aligned build shows NO Exchange
    val acc = spark.sparkContext.collectionAccumulator[(Long, Long)]("rtExtents")
    val plan = IndexBuilder.buildCombinedAligned(
      Corpus.readStorageOrdered(spark, dir),
      BuildConfig(chunkDocs = 10, strategy = "aligned"), acc)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"round-trip plan shuffles:\n$plan")
    // and the built index equals a bychunk build over the same docs
    val out = SparkTestBase.tempDir("graft-storage-idx")
    IndexBuilder.build(spark, Corpus.readStorageOrdered(spark, dir), out,
      BuildConfig(chunkDocs = 10, strategy = "aligned"))
    val out2 = SparkTestBase.tempDir("graft-storage-idx-ref")
    IndexBuilder.build(spark, partitioned(Seq(docs.toSeq)), out2,
      BuildConfig(chunkDocs = 10, strategy = "bychunk"))
    assert(canonP(out) === canonP(out2))
    assert(canonD(out) === canonD(out2))
  }

  test("Bench.replicatedAligned equals Bench.replicated row-for-row and satisfies the precondition") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val a = graft.Bench.replicatedAligned(spark, sfDir, factor = 3, slices = 2)
    val b = graft.Bench.replicated(spark, sfDir, factor = 3)
    def canon(ds: org.apache.spark.sql.Dataset[IdDoc]) =
      ds.collect().map(d => (d.docId, d)).toMap
    assert(canon(a) === canon(b))
    // per-partition docId-ascending + chunk-aligned at the bench default
    // chunkDocs (30000; holds for ANY chunkDocs < the 10^7 copy shift,
    // because partition boundaries sit between copies and the docId gap
    // between adjacent copies exceeds a whole chunk)
    val cd = 30000L
    val extents = a.mapPartitions { it =>
      var min = Long.MaxValue; var max = Long.MinValue; var ok = true
      it.foreach { d =>
        if (max != Long.MinValue && d.docId <= max) ok = false
        if (d.docId < min) min = d.docId
        max = d.docId
      }
      if (max == Long.MinValue) Iterator.empty else Iterator.single((min, max, ok))
    }.collect()
    assert(extents.forall(_._3), "a bench partition is not docId-ascending")
    val sortedE = extents.sortBy(_._1)
    sortedE.zip(sortedE.drop(1)).foreach { case ((_, aMax, _), (bMin, _, _)) =>
      assert(aMax < bMin && aMax / cd != bMin / cd,
        s"bench partitions straddle a chunk: $aMax vs $bMin")
    }
  }
}
