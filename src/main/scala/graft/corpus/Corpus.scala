package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.{IdDoc, SourceDoc}

/** Builders for the input table of BASELINE.json input_hint:
  * `(repo: string, path: string, commit: string, lang: string,
  * content: string)`.
  *
  * Two sources:
  *  - [[fromDocumentsParquet]] maps the driver-generated
  *    `documents.parquet` (doc_id, text, lang, source, n_chars) onto that
  *    shape with *deterministic, SQL-reproducible* derivations, so DuckDB
  *    oracles can re-derive identical rows.
  *  - [[synthetic]] is the seeded generator of FIXTURES.md §1 for unit
  *    tests (Zipf-ish df skew, deliberate tokenizer noise).
  */
object Corpus {

  /** docId assignment for the testdata corpus: doc_id is already dense and
    * deterministic, so it is the docId (FIXTURES.md §2's dense_rank
    * collapses to identity here).
    */
  def fromDocumentsParquet(spark: SparkSession, sfDir: String): Dataset[IdDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        $"doc_id".cast("long").as("docId"),
        concat(lit("org"), $"doc_id" % 50, lit("/proj"), $"doc_id" % 50).as("repo"),
        concat($"source", lit("/doc"), $"doc_id", lit(".txt")).as("path"),
        substring(md5($"doc_id".cast("string")), 1, 8).as("commit"),
        $"lang",
        $"text".as("content"))
      .as[IdDoc]
  }

  /** url ≙ DocumentData.URL (SURVEY.md §1.1): repo + "/" + path + "@" + commit. */
  def url(repo: String, path: String, commit: String): String =
    repo + "/" + path + "@" + commit

  /** Assign dense docIds to an arbitrary input table, scalably.
    *
    * The pinned identity is `docId = dense rank over (repo, path, commit)`
    * (FIXTURES.md §2) but a naive `row_number().over(Window.orderBy(...))`
    * is a single-partition bottleneck at 10^12 rows. Instead:
    * range-partition by the key, sort within partitions, count rows per
    * partition, and add the per-partition offsets — the classic scalable
    * zipWithIndex, deterministic because the key order is total.
    */
  def assignDocIds(spark: SparkSession, src: Dataset[SourceDoc],
                   numPartitions: Int = 0): Dataset[IdDoc] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val sorted = src
      .repartitionByRange(parts, $"repo", $"path", $"commit")
      .sortWithinPartitions($"repo", $"path", $"commit")
    val counts = sorted.rdd.mapPartitionsWithIndex {
      (i, it) => Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    // mapPartitionsWithIndex on the RDD, NOT TaskContext.getPartitionId
    // inside Dataset.mapPartitions: the RDD index is the parent
    // partition's own, so the ids stay correct even if a consumer
    // coalesce(1)s the result (which merges parents into one task and
    // makes TaskContext report the merged id — a silent off-by-offsets
    // corruption the Packing operator actually hit).
    val withIds = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var next = bcOffsets.value(pid)
      it.map { d => val id = next; next += 1
        IdDoc(id, d.repo, d.path, d.commit, d.lang, d.content) }
    }
    spark.createDataset(withIds)
  }

  /** Seeded synthetic corpus (FIXTURES.md §1). Generated on the driver —
    * only used at unit-test scales.
    */
  def synthetic(spark: SparkSession, numRepos: Int, filesPerRepo: Int,
                seed: Long = 42L): Dataset[SourceDoc] = {
    import spark.implicits._
    val lexicon = {
      val rnd = new scala.util.Random(seed)
      (0 until 5000).map { _ =>
        val len = 3 + rnd.nextInt(8)
        (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }.toArray
    }
    val langs = Array("scala", "java", "py", "c")
    val docs = for {
      r <- 0 until numRepos
      f <- 0 until filesPerRepo
    } yield {
      val rnd = new scala.util.Random(seed * 1000003L + r * 7919L + f)
      val lang = langs(rnd.nextInt(langs.length))
      val segs = (0 until 2 + rnd.nextInt(2)).map(_ => lexicon(rnd.nextInt(200)))
      val path = segs.mkString("/") + "/" + lexicon(rnd.nextInt(500)) + "." + lang
      val commit = (0 until 8).map(_ => "0123456789abcdef"(rnd.nextInt(16))).mkString
      val n = 50 + rnd.nextInt(1951)
      val words = (0 until n).map { _ =>
        rnd.nextInt(100) match {
          case 0 => "x" * (20 + rnd.nextInt(10))          // length-filter noise
          case 1 => "w0rd_" + rnd.nextInt(100)            // non-alpha noise
          case _ =>
            // Zipf-ish: rank ~ floor(exp(u * ln(V))) biases low ranks
            val u = rnd.nextDouble()
            lexicon((math.exp(u * math.log(lexicon.length)) - 1).toInt.min(lexicon.length - 1))
        }
      }
      SourceDoc(s"org$r/proj$r", path, commit, lang, words.mkString(" "))
    }
    spark.createDataset(docs)
  }
}
