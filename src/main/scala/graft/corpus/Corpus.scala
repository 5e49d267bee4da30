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

  /** Persist an id-assigned corpus in STORAGE ORDER: a block-partitioned
    * parquet table (block = docId div (chunkDocs * blockChunks)), exactly
    * one FILE per block, rows docId-ascending inside it. This is the
    * ingest's end of the aligned-build contract: a table written here and
    * read back through [[readStorageOrdered]] satisfies
    * `IndexBuilder.buildCombinedAligned`'s precondition (docId-ascending,
    * chunk-aligned partitions) with zero read-time work — block
    * boundaries are chunk multiples by construction.
    *
    * One file per block because each block hashes to exactly one task
    * (`repartition(col("block"))`) and the dynamic-partition write splits
    * a task's sorted rows by block. Size `blockChunks` so a block file
    * stays under `spark.sql.files.maxPartitionBytes`, or the read-back
    * scan would split it.
    */
  def writeStorageOrdered(ids: Dataset[IdDoc], dir: String,
                          chunkDocs: Long, blockChunks: Int = 8): Unit = {
    val blockDocs = chunkDocs * blockChunks
    ids.toDF()
      .withColumn("block", (col("docId") / blockDocs).cast("long"))
      .repartition(col("block"))
      .sortWithinPartitions("block", "docId")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("block").parquet(dir)
  }

  /** Read a [[writeStorageOrdered]] corpus back with its order intact:
    * one input partition per BLOCK, blocks ascending, rows in file order
    * (docId-ascending) — a Dataset that feeds the zero-exchange aligned
    * build directly. Implementation: a union of per-block single-file
    * scans; union concatenates child partitions in order, and a block dir
    * holds exactly one file (verified here — two files would let split
    * planning reorder rows), so Spark cannot re-bin-pack or split the
    * read as long as the file is under maxPartitionBytes. Plan size is
    * ∝ block count — fine to ~10^4 blocks; past that, batch the unions
    * or drop to an RDD of per-file reads (the aligned build only needs
    * per-partition order, not a single plan).
    */
  def readStorageOrdered(spark: SparkSession, dir: String): Dataset[IdDoc] = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val blocks = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("block="))
      .map(s => (s.getPath.getName.stripPrefix("block=").toLong, s.getPath))
      .sortBy(_._1)
    require(blocks.nonEmpty, s"no block= partition dirs under $dir")
    blocks.foreach { case (b, p) =>
      val files = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
      require(files.length == 1,
        s"block $b holds ${files.length} files — storage order requires exactly one " +
        "(was the table written by writeStorageOrdered?)")
    }
    blocks.iterator.map { case (_, p) => spark.read.parquet(p.toString) }
      .reduce(_.union(_))
      .select(col("docId"), col("repo"), col("path"), col("commit"),
        col("lang"), col("content"))
      .as[IdDoc]
  }

  /** Explicit read schema for text-format document shards (the [[IdDoc]]
    * shape; the `shard` partition column is discovered from the dir
    * layout, not the rows). NEVER inferred: JSON/CSV schema inference is
    * a full extra pass over the data — at 100 TB that doubles ingest I/O
    * before the first useful byte, and a skewed sample can silently
    * narrow a column's type.
    */
  val shardReadSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("docId", LongType, nullable = false),
      StructField("repo", StringType, nullable = false),
      StructField("path", StringType, nullable = false),
      StructField("commit", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("content", StringType, nullable = false)))
  }

  private def shardedWriter(ids: Dataset[IdDoc], numShards: Int) = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    ids.toDF()
      .withColumn("shard", pmod(col("docId"), lit(numShards.toLong)))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "docId")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard")
  }

  /** Export an id-assigned corpus as sharded JSONL — the LLM-training
    * interchange format (one JSON object per line, `shard=N/` dirs, rows
    * docId-ascending inside a shard, exactly one file per shard because
    * each shard value hashes to exactly one task). `shard = docId mod
    * numShards` is deterministic and SQL-reproducible so cross-engine
    * oracles can re-derive the assignment; callers who want the
    * *shuffled* training order compose with
    * `TextAnalysis.shardForTraining` first. Size numShards so a shard
    * stays a one-task unit (~100-500 MB): that is also what makes an
    * optional non-splittable `compression` codec ("gzip") acceptable —
    * the file is never split anyway.
    */
  def writeJsonlShards(ids: Dataset[IdDoc], dir: String, numShards: Int,
                       compression: String = "none"): Unit =
    shardedWriter(ids, numShards).option("compression", compression).json(dir)

  /** Read a [[writeJsonlShards]] corpus back (explicit schema, no
    * inference pass). JSONL is the *splittable* text ingest format: an
    * uncompressed shard bigger than maxPartitionBytes still scans in
    * parallel because JSON lines split on newlines.
    */
  def fromJsonlShards(spark: SparkSession, dir: String): Dataset[IdDoc] = {
    import spark.implicits._
    spark.read.schema(shardReadSchema).json(dir)
      .select(col("docId"), col("repo"), col("path"), col("commit"),
        col("lang"), col("content"))
      .as[IdDoc]
  }

  /** CSV twin of [[writeJsonlShards]] (RFC 4180 quoting: quote-doubling
    * via escape==quote, so embedded quotes/delimiters round-trip exactly;
    * whitespace trimming OFF — the writer defaults it ON; `emptyValue`
    * pinned to quoted-empty so "" survives the trip).
    *
    * The trip is byte-exact (spec-pinned, CR/CRLF content included) for
    * tables written HERE: the always-LF header line pins the reader's
    * line-separator auto-detection to LF before any quoted CR appears.
    * Foreign CSVs without that guarantee may see quoted CRs normalized —
    * corpora where \r must survive arbitrary producers ship as JSONL.
    */
  def writeCsvShards(ids: Dataset[IdDoc], dir: String, numShards: Int): Unit =
    shardedWriter(ids, numShards)
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("emptyValue", "\"\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)

  /** Read a [[writeCsvShards]] corpus back. SCALE CAVEAT (the reason
    * JSONL is the default interchange format): quoted multi-line fields
    * force `multiLine=true`, and a multiLine CSV file is NOT splittable —
    * each shard file is one task no matter its size. Acceptable only
    * because [[writeCsvShards]] shards are sized as one-task units;
    * corpora that arrive as few huge CSVs must be re-sharded (or
    * re-rendered as JSONL) before parallel ingest.
    *
    * Deliberately NO explicit `lineSep`: setting it makes the parser
    * normalize CR/CRLF inside quoted fields (observed: CRLF -> LF, lone
    * CR dropped), while auto-detection — pinned to LF by the header
    * line of every [[writeCsvShards]] file — preserves quoted CRs
    * byte-exactly (spec-pinned).
    */
  def fromCsvShards(spark: SparkSession, dir: String): Dataset[IdDoc] = {
    import spark.implicits._
    spark.read.schema(shardReadSchema)
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      // a read-side nullValue that can never occur in a document keeps
      // the parsed empty string "" from collapsing to null (the reader's
      // default nullValue IS the empty string)
      .option("nullValue", "\u0000")
      .csv(dir)
      .select(col("docId"), col("repo"), col("path"), col("commit"),
        col("lang"), col("content"))
      .as[IdDoc]
  }

  /** ORC twin of [[writeJsonlShards]] — the columnar interchange format
    * for warehouses that standardize on ORC instead of Parquet (Hive
    * lineage). Same layout contract: `shard=N/` dirs, one file per
    * shard, rows docId-ascending. Binary-typed columns make the trip
    * byte-exact by construction (no quoting/escaping layer at all);
    * ORC stripes keep big shards splittable like Parquet.
    */
  def writeOrcShards(ids: Dataset[IdDoc], dir: String, numShards: Int): Unit =
    shardedWriter(ids, numShards).orc(dir)

  /** Read a [[writeOrcShards]] corpus back. The explicit schema skips
    * nothing ORC-side (self-describing format) but pins the read types
    * so a widened writer cannot silently change downstream plans.
    */
  def fromOrcShards(spark: SparkSession, dir: String): Dataset[IdDoc] = {
    import spark.implicits._
    spark.read.schema(shardReadSchema).orc(dir)
      .select(col("docId"), col("repo"), col("path"), col("commit"),
        col("lang"), col("content"))
      .as[IdDoc]
  }

  /** Per-shard integrity manifest — the audit you actually run after a
    * 100 TB export: doc count, docId extent, and an ORDER-INDEPENDENT
    * content digest per shard (bit_xor of each doc's 60-bit md5 prefix —
    * 15 hex chars so the value fits a signed 64-bit lane portably).
    * XOR makes the digest mergeable (manifest(A ∪ B) = manifest(A) ⊕
    * manifest(B) bin-wise) and insensitive to row order, so a manifest
    * computed over a round-tripped rendering (JSONL/CSV/ORC shards read
    * back in any split order) must equal the source-of-truth manifest
    * bit-for-bit; any dropped, duplicated, or corrupted doc flips it.
    * One bounded exchange (numShards rows out).
    */
  def shardManifest(ids: Dataset[IdDoc], numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    ids.toDF()
      .select(pmod(col("docId"), lit(numShards.toLong)).as("shard"),
        col("docId"),
        expr("cast(conv(substring(md5(content), 1, 15), 16, 10) as bigint)")
          .as("h60"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("docId")).as("min_doc_id"),
        max(col("docId")).as("max_doc_id"),
        expr("bit_xor(h60)").as("content_digest"))
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
