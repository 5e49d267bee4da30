package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analysis.{AnnStore, Dedup, Similarity, TextAnalysis}
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexStore}

/** Prints the physical plans of the engine's hot paths so pushdown,
  * pruning, and codegen spans can be audited (runMain graft.tools.PlanAudit).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val out = java.nio.file.Files.createTempDirectory("audit_idx").toString
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))

    def section(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n=== $name ===")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    section("posting scan: term filter pushdown + chunk pruning") {
      IndexStore.readPostings(spark, out).toDF()
        .filter($"term".isin("spark", "dup") && $"chunk".isin(0L, 1L))
        .select($"chunk", $"term", $"df", $"tf")
    }

    section("tokenize pipeline (codegen span)") {
      IndexBuilder.tokens(src, IndexBuilder.BuildConfig(chunkDocs = 200)).toDF()
    }

    section("grouped posting build: ONE exchange, partitioned by chunk") {
      // the write consumes this directly (partitionBy(chunk) matches the
      // exchange), so there is no second shuffle of encoded blobs
      IndexBuilder.buildPostingsGrouped(
        IndexBuilder.tokenGroups(src, IndexBuilder.BuildConfig(chunkDocs = 200))).toDF()
    }

    section("bychunk posting build (default): ONE exchange of RAW DOCS by chunk") {
      // the only Exchange in the plan sits directly over the doc scan —
      // shuffle bytes == corpus bytes; tokenize + posting build are
      // reduce-side (inside the post-exchange mapPartitions), so nothing
      // token- or term-shaped ever crosses the wire
      IndexBuilder.buildPostingsByChunk(
        src, IndexBuilder.BuildConfig(chunkDocs = 200)).toDF()
    }

    section("aligned combined build: ZERO Exchange (ingest-order fast path)") {
      // input partitions are already docId-ascending and chunk-aligned
      // (the ingest's own storage order), so tokenize + posting build +
      // write all happen inside the input partitions — the plan must
      // show scan -> project -> mapPartitions with NO Exchange anywhere;
      // contrast with the bychunk section above, whose one corpus-sized
      // exchange exists to co-locate chunks for arbitrary input order
      val acc = spark.sparkContext.collectionAccumulator[(Long, Long)]("auditExtents")
      IndexBuilder.buildCombinedAligned(src,
        IndexBuilder.BuildConfig(chunkDocs = 200, strategy = "aligned"), acc).toDF()
    }

    section("term stats aggregation") {
      TextAnalysis.termStats(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    }

    section("bm25 global df aggregate") {
      IndexStore.readPostings(spark, out).toDF()
        .filter($"term".isin("spark", "dup"))
        .groupBy($"term").agg(sum($"df"))
    }

    section("bm25 metadata lookup: chunk partition pruning + docId pushdown") {
      // mirrors Bm25Engine.search's final-k resolve: the derived chunk
      // predicate must appear as PartitionFilters (only hit chunks'
      // directories opened), docId as PushedFilters
      IndexStore.readDocs(spark, out).toDF()
        .filter($"chunk".isin(0L, 2L) && $"docId".isin(5L, 410L))
        .select($"docId", $"url", $"title")
    }

    section("append/compact boundary read: single-partition PartitionFilters") {
      // the read side of appendBuild's boundary merge and compact's purge:
      // chunk = <boundary> must appear as PartitionFilters so exactly ONE
      // partition directory is opened no matter how many chunks the index
      // has — maintenance IO is delta-proportional, never corpus-sized
      IndexStore.readPostings(spark, out).toDF().filter($"chunk" === 2L)
    }

    section("shingles: per-row projection, no window exchange") {
      // explode of a per-row sequence + slice of the kept-token array:
      // the plan must contain NO Exchange and NO Window
      TextAnalysis.shingles(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    }

    section("repetition: two partial-agg groupBys over the shingle projection") {
      // both aggregates show partial/final HashAggregate pairs (map-side
      // combine); no Window operator anywhere
      TextAnalysis.repetition(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    }

    section("quality gate: metric inline on the scan, ONE lang-keyed rank exchange") {
      // kept_ratio is a per-row projection (no join back to quality());
      // the plan must show exactly one Exchange — the Window's
      // hashpartitioning(lang) — and no Join
      TextAnalysis.qualityGate(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 0.25)
    }

    section("exact set-similarity join: prefix filter BEFORE the self-join") {
      // the rank+size windows share ONE doc_id-keyed exchange (never a
      // global order), the df aggregate shows partial/final HashAggregate
      // pairs, and the rnk <= sz - ceil(...) + 1 Filter sits UNDER the
      // self-join — only prefix rows enter the candidate join (AQE picks
      // broadcast at audit scale; same filter-below-join shape either way)
      Dedup.prefixCandidatePairs(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 0.7)
    }

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    section("ANN: lshBuckets is one projection over the scan (no Exchange)") {
      Similarity.lshBuckets(emb, nBits = 5)
    }

    val annOut = java.nio.file.Files.createTempDirectory("audit_ann").toString
    AnnStore.build(emb, annOut, nBits = 5)
    section("ANN store probe: bucket PartitionFilters (only probe dirs opened)") {
      val store = AnnStore.load(spark, annOut)
      val qv = AnnStore.vectorOf(emb, 0L)
      AnnStore.topK(store, qv, k = 10, nBits = 5, multiProbe = true)
    }

    section("champion sidecar probe: bucket PartitionFilters + term pushdown") {
      // the prefix read must prune on the query terms' bucket partition
      // dirs (PartitionFilters) and push the term/rank filters; no
      // posting blob column in ReadSchema
      graft.index.ChampionSidecar.build(spark, out, m = 8, nBuckets = 8)
      graft.index.ChampionSidecar.candidateFrame(spark, out,
        Seq("spark", "dup"), 8).get
    }

    section("staged merge census: bounded aggs over the persisted hit set") {
      // the staged path's census jobs are partial-agg groupBys over the
      // <= 30-rows-per-chunk hit set — never corpus-shaped; the prune
      // itself is a mapPartitions with no extra Exchange (the hit rows
      // stay where the cogroup left them)
      val eng = new graft.engine.SearchEngine(spark, out, 200,
        broadcastDocsLimit = 0L)
      val (astOpt, flat) = graft.query.QueryParser.parseQuery("spark dup")
      eng.searchChunksEither(astOpt.get, flat, 30) match {
        case Right((ds, _)) =>
          ds.toDF().groupBy($"url").count().filter($"count" > 1).select($"url")
        case Left(_) => sys.error(
          "staged census section resolved Left — the audit query no " +
            "longer qualifies and the census plan was NOT audited")
      }
    }

    val docsTbl = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    section("decontamination hits: probe grams BROADCAST, corpus side never wide-shuffled") {
      // must show BroadcastHashJoin (probes side) and no Exchange below
      // the doc-gram projection; the hit agg's exchange carries matched
      // rows only
      graft.analysis.Decontamination.hits(docsTbl,
        graft.analysis.Decontamination.probeGrams(docsTbl, 5), 5)
    }

    section("sequence packing: window partitioned by BUCKET, no global-order window") {
      // the Window's partitioning must be [bucket], never empty (a global
      // ORDER BY window would be a single-partition bottleneck)
      graft.analysis.Packing.packSequences(docsTbl, budget = 4096)
    }

    section("k-means assign: one projection over the scan (no Exchange)") {
      graft.analysis.Clustering.assign(emb, k = 8)
    }

    val ivfOut = java.nio.file.Files.createTempDirectory("audit_ivf").toString
    graft.analysis.IvfStore.build(emb, ivfOut, k = 8)
    section("IVF store probe: cluster PartitionFilters (only nprobe cell dirs opened)") {
      val store = graft.analysis.IvfStore.load(spark, ivfOut)
      val cents = graft.analysis.IvfStore.loadCentroids(spark, ivfOut)
      graft.analysis.IvfStore.topK(store, cents,
        AnnStore.vectorOf(emb, 0L), k = 10, nprobe = 3)
    }

    val ivfpqOut = java.nio.file.Files.createTempDirectory("audit_ivfpq").toString
    graft.analysis.IvfPqStore.build(emb, ivfpqOut, kCells = 8, m = 4, kCents = 8)
    section("IVF-PQ probe: cluster PartitionFilters over the CODES-ONLY store, ADC projection") {
      // the scan must open only the nprobe cell dirs AND read no
      // embedding column (ReadSchema is (vec_id, codes)); scoring is
      // literal-LUT lookups in the projection, no Exchange, no Join
      val store = graft.analysis.IvfPqStore.load(spark, ivfpqOut)
      graft.analysis.IvfPqStore.topK(store,
        graft.analysis.IvfPqStore.loadCentroids(spark, ivfpqOut),
        graft.analysis.IvfPqStore.loadCodebooks(spark, ivfpqOut),
        AnnStore.vectorOf(emb, 0L), k = 10, nprobe = 3)
    }

    section("BPE pair counts: posexplode projection into ONE partial agg (vocab-keyed)") {
      // the corpus-sized job is wordFreqs' groupBy; the pair count's
      // exchange is keyed by (lhs, rhs) — symbol-vocabulary-bounded
      graft.analysis.Bpe.pairCounts(graft.analysis.Bpe.initialSegments(docsTbl))
    }

    section("semantic near-dup: per-row cell projection, ONE equi-join shuffle on cluster") {
      // cell assignment must be a projection (no join-back-by-vec_id);
      // the only wide exchange is the cluster equi-join's
      graft.analysis.Dedup.semanticNearDupsKmeans(emb, threshold = 0.35, k = 8)
    }

    section("snippets: one projection over the scan (no Exchange, no Join)") {
      // first-hit position + window slice are array expressions on the
      // kept-token projection; nothing leaves the scan task
      TextAnalysis.snippets(docsTbl, "merge", 3)
    }

    section("bigram LM score: per-row bigrams, count joins keyed on the model keys") {
      // the bigram stream is the 2-shingle per-row projection (no Window);
      // c2/c1 are partial/final HashAggregate pairs; the scoring joins key
      // on (w1,w2)/(w1) — vocabulary-sized sides, shuffle joins at the
      // information floor; V is a one-row broadcast
      TextAnalysis.lmCrossEntropy(docsTbl)
    }

    section("training shards: shard/sort keys in the scan, ONE shard-keyed window exchange") {
      // the window partitioning must be [shard] (never a global order)
      TextAnalysis.shardForTraining(docsTbl, numShards = 16)
    }

    section("TF-IDF keywords: partial-agg tf/df, term-keyed join, ONE doc-keyed rank window") {
      TextAnalysis.keywordsTfIdf(docsTbl, 5)
    }

    section("token-budget mix: window partitioned by (lang, BUCKET) + broadcast offsets") {
      // same contract as sequence packing: the prefix-sum window must be
      // partitioned by (lang, bucket) — never lang alone (one language
      // can be half the corpus = one sort task); the per-bucket offsets
      // ride a BroadcastExchange
      TextAnalysis.tokenBudgetMix(docsTbl,
        Map("en" -> 3000L, "fr" -> 1200L), defaultBudget = 800L)
    }

    section("perplexity buckets: ONE lang-keyed rank window over the LM-score joins") {
      TextAnalysis.perplexityBuckets(docsTbl, 3)
    }

    section("hard negatives: centroid-literal cosine projection + anti-join, no wide exchange") {
      // the centroid was collected (d doubles) before this plan exists;
      // scoring shows scan -> anti-join (broadcast at this scale) ->
      // project -> TakeOrderedAndProject
      Similarity.hardNegatives(docsTbl, emb, "merge", 10)
    }

    section("leakage-safe split: corpus left-joins the near-dup-sized cluster table") {
      graft.analysis.Dedup.leakageSafeSplit(docsTbl, 0.7, 200)
    }

    section("stats read is column-pruned (no blob)") {
      IndexStore.readPostings(spark, out).toDF().groupBy($"chunk")
        .agg(count(lit(1)).as("uniqueTerms"))
    }

    val eventsTbl = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val evT = floor($"ts".cast("timestamp").cast("double")).cast("long")

    section("as-of join: union -> ONE key exchange -> running-last window (no nested loop)") {
      graft.analysis.TemporalJoins.asofJoin(
        eventsTbl.filter($"event_type" =!= "purchase")
          .select($"user_id", evT.as("t"), $"event_id"),
        eventsTbl.filter($"event_type" === "purchase")
          .select($"user_id", evT.as("t"), $"event_id", $"value")
          .groupBy($"user_id", $"t")
          .agg(max_by($"value", $"event_id").as("v")),
        key = "user_id", t = "t")
    }

    section("bucketed range join: interval explode + bucket EQUI-join (no BNLJ/Cartesian)") {
      graft.analysis.TemporalJoins.rangeJoinBucketed(
        graft.streaming.StreamingIngest.sessionizeSql(
          eventsTbl.select($"user_id", $"ts".cast("timestamp").as("ts"), $"value"))
          .select($"user_id", $"start_ts", $"end_ts"),
        eventsTbl.select($"user_id".as("p_user"), $"event_id".as("p_event"),
          evT.as("p_t")),
        "start_ts", "end_ts", "p_t", bucketSec = 3600)
    }

    section("DSIR scoring: scan -> literal-LUT fold projection (no Exchange, no Join)") {
      graft.analysis.Dsir.importanceWeights(docsTbl, targetLang = "en", nBuckets = 16)
    }

    section("spell suggest: vocab-sized variant explode, query side BROADCAST into the join") {
      graft.analysis.SpellCorrect.suggest(docsTbl, Seq("quary"), k = 3)
    }

    section("time-travel as-of read: chunk PartitionFilters BEFORE blob decode") {
      graft.index.TimeTravel.postingsAsOf(spark, out, asOfDocMax = 150L)
    }

    section("code-quality metrics: one codegen projection (no Exchange)") {
      graft.analysis.CodeQuality.metrics(
        src.toDF().select($"repo", $"path", $"content"))
    }

    graft.index.TrigramSidecar.build(spark, out, nBuckets = 16)
    section("wildcard probe: bucket PartitionFilters + tri isin pushdown, candidate-sized agg") {
      graft.index.TrigramSidecar.wildcardTerms(spark, out, "sp*k")
    }

    section("facet counts: qualifying-chunk PartitionFilters on docs + BROADCAST hit join") {
      graft.engine.Facets.conjunctiveFacets(spark, out, Seq("spark", "dup"))
    }
    spark.stop()
  }
}
