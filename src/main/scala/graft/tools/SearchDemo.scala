package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.engine.SearchEngine
import graft.index.IndexBuilder

/** CLI surface for manual driving:
  * runMain graft.tools.SearchDemo <sfDir> <indexDir> <query...>
  * Builds the index if absent, runs the query, prints the top-k like the
  * reference's testQuery.cpp printout.
  */
object SearchDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val indexDir = args(1)
    val query = args.drop(2).mkString(" ")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val envChunkDocs = sys.env.getOrElse("SPARK_GRAFT_CHUNK_DOCS", "200").toLong
    // FS-aware probe: a java.io.File check misreads scheme-qualified URIs
    // (file:/hdfs:/s3a:) as missing and would rebuild an existing index
    if (!IndexBuilder.pathExists(spark, s"$indexDir/postings")) {
      val src = Corpus.fromDocumentsParquet(spark, sfDir)
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, src, indexDir,
        IndexBuilder.BuildConfig(chunkDocs = envChunkDocs))
      println(f"[build] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // the engine must score with the chunkDocs the INDEX was built with
    // (avgdl = totalPosts / chunkDocs): the stats table persists it, so a
    // pre-existing index built with a different value is scored correctly
    // without any env coordination; only legacy stats (sentinel -1 /
    // missing) fall back to the env default
    val chunkDocs = try {
      val c = graft.index.IndexStore.readStats(spark, indexDir)
        .toDF().agg(org.apache.spark.sql.functions.max("chunkDocs"))
        .head().getLong(0)
      if (c > 0) c else envChunkDocs
    } catch {
      // legacy index without a stats table -> env default; fatal errors
      // (OOM, interrupts) must still propagate
      case scala.util.control.NonFatal(e) =>
        Console.err.println(s"[demo] stats chunkDocs unavailable (${e.getMessage}); " +
          s"using env default $envChunkDocs")
        envChunkDocs
    }
    // "bm25:" prefix routes to the BM25/WAND engine; "bm25and:" to the
    // conjunctive leapfrog path
    if (query.startsWith("debug:")) {
      // per-candidate DebugScore breakdown (the reference prints this from
      // tests/testQuery.cpp:47-61) — the rank-divergence field diagnostic
      val engine = new SearchEngine(spark, indexDir, chunkDocs)
      val q = query.substring(query.indexOf(':') + 1)
      val hits = engine.searchDebug(q)
      println(s"""Debug: "$q" -> ${hits.size} scored candidates""")
      println(f"${"chunk"}%5s ${"docId"}%6s ${"static"}%6s ${"url"}%4s " +
        f"${"title"}%5s ${"bodyRaw"}%7s ${"body"}%5s ${"dynW"}%4s ${"total"}%6s")
      hits.foreach { h =>
        println(f"${h.chunk}%5d ${h.docId}%6d ${h.sStatic}%6d ${h.sUrl}%4d " +
          f"${h.sTitle}%5d ${h.sBodyRaw}%7d ${h.sBody}%5d ${h.dynamicWeight}%4d ${h.total}%6d")
      }
    } else if (query.startsWith("wild:")) {
      // wildcard term lookup through the trigram sidecar (built on first
      // use); "wild:sp*k" prints matched terms + their index tf/df
      val p = query.substring(query.indexOf(':') + 1).trim
      if (!graft.index.TrigramSidecar.exists(spark, indexDir))
        graft.index.TrigramSidecar.build(spark, indexDir)
      val t0 = System.nanoTime()
      val hits = graft.index.TrigramSidecar.wildcardStats(spark, indexDir, p)
        .orderBy(org.apache.spark.sql.functions.desc("tf")).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"""Wildcard: "$p" -> ${hits.length} terms in ${f"$dt%.3f"} s""")
      hits.foreach { r =>
        println(f"  ${r.getString(0)}%-24s tf=${r.getLong(1)}%-8d df=${r.getLong(2)}")
      }
    } else if (query.startsWith("fed:") || query.startsWith("fedref:")) {
      // federated scatter-gather over two shard indexes built from the
      // corpus halves (second half rebased — colliding docId spaces),
      // created next to indexDir on first use; "fed:" = global-stats
      // BM25, "fedref:" = chunk-order RefScore fan-in
      val a = s"$indexDir-shard0"
      val b = s"$indexDir-shard1"
      if (!IndexBuilder.pathExists(spark, s"$a/postings")) {
        import spark.implicits._
        val ids = Corpus.fromDocumentsParquet(spark, sfDir)
        val mid = ids.agg(org.apache.spark.sql.functions.max($"docId"))
          .as[Long].head() / 2
        val cfg = IndexBuilder.BuildConfig(chunkDocs = envChunkDocs)
        IndexBuilder.build(spark, ids.filter(_.docId <= mid), a, cfg)
        IndexBuilder.build(spark,
          ids.filter(_.docId > mid).map(d => d.copy(docId = d.docId - mid - 1)),
          b, cfg)
        println(s"[build] two shard indexes at $a / $b")
      }
      val q = query.substring(query.indexOf(':') + 1)
      val t0 = System.nanoTime()
      if (query.startsWith("fedref:")) {
        val fed = new graft.engine.FederatedSearch(spark, Seq(a, b))
        val hits = fed.search(q)
        val dt = (System.nanoTime() - t0) / 1e9
        println(s"""Federated RefScore: "$q" -> ${hits.size} results in ${f"$dt%.3f"} s""")
        hits.zipWithIndex.foreach { case (h, i) =>
          println(f"${i + 1}%2d. score=${h.score}%-6d docId=${h.docId}%-6d ${h.url}")
        }
      } else {
        val fed = new graft.engine.FederatedBm25(spark, Seq(a, b))
        val hits = fed.search(q)
        val dt = (System.nanoTime() - t0) / 1e9
        println(s"""Federated BM25: "$q" -> ${hits.size} results in ${f"$dt%.3f"} s""")
        hits.zipWithIndex.foreach { case (h, i) =>
          println(f"${i + 1}%2d. score=${h.score}%.4f docId=${h.docId}%-6d ${h.url}")
        }
      }
    } else if (query.startsWith("bm25:") || query.startsWith("bm25and:")) {
      val engine = new graft.engine.Bm25Engine(spark, indexDir)
      val mode = if (query.startsWith("bm25and:")) engine.And else engine.Or
      val q = query.substring(query.indexOf(':') + 1)
      val t0 = System.nanoTime()
      val hits = engine.search(q, mode = mode)
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"""BM25 Query: "$q" -> ${hits.size} results in ${f"$dt%.3f"} s""")
      hits.zipWithIndex.foreach { case (h, i) =>
        println(f"${i + 1}%2d. score=${h.score}%.4f docId=${h.docId}%-5d ${h.url}")
      }
    } else if (query.startsWith("prf:")) {
      // pseudo-relevance feedback: prints the chosen expansion then the
      // re-ranked top-k
      val engine = new graft.engine.Bm25Engine(spark, indexDir)
      val q = query.substring(query.indexOf(':') + 1)
      val terms = graft.tokenizer.Tokenizer.bodyTokens(q).distinct.toSeq
      val t0 = System.nanoTime()
      val (exp, hits) = engine.searchTermsPrf(terms, 10)
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"""PRF Query: "$q" + [${exp.mkString(", ")}] -> ${hits.size} results in ${f"$dt%.3f"} s""")
      hits.zipWithIndex.foreach { case (h, i) =>
        println(f"${i + 1}%2d. score=${h.score}%.4f docId=${h.docId}")
      }
    } else if (query.startsWith("mlt:")) {
      // more-like-this: the argument is a seed doc_id; its top TF-IDF
      // keywords (printed) become an OR query, the seed is excluded
      val engine = new graft.engine.Bm25Engine(spark, indexDir)
      val seedId = query.substring(query.indexOf(':') + 1).trim.toLong
      val seedText = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(org.apache.spark.sql.functions.col("doc_id") === seedId)
        .select("text").head().getString(0)
      val t0 = System.nanoTime()
      val hits = engine.moreLikeThis(seedId, seedText, kTerms = 5, k = 10)
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"MLT seed doc $seedId -> ${hits.size} results in ${f"$dt%.3f"} s")
      hits.zipWithIndex.foreach { case (h, i) =>
        println(f"${i + 1}%2d. score=${h.score}%.4f docId=${h.docId}")
      }
    } else if (query.startsWith("bm25f:") || query.startsWith("champ:") ||
               query.startsWith("prox:") || query.startsWith("ql:") ||
               query.startsWith("phrase:") || query.startsWith("bm25fchamp:") ||
               query.startsWith("proxchamp:")) {
      // "bm25f:" = field-weighted BM25F (title lists weighted 2.5x);
      // "champ:" = champion-list static pruning (per-term top-64);
      // "bm25fchamp:" / "proxchamp:" = the champion-accelerated fielded /
      //   proximity rankers (body-routed top-64 candidates, full model
      //   over candidates only — sidecar-served when one is present);
      // "prox:" = proximity-weighted BM25 (window 5);
      // "ql:" = Dirichlet query likelihood (mu 300);
      // "phrase:" = positional phrase BM25 (terms in the given order)
      val engine = new graft.engine.Bm25Engine(spark, indexDir)
      val q = query.substring(query.indexOf(':') + 1)
      val ordered = graft.tokenizer.Tokenizer.bodyTokens(q).toSeq
      val terms = ordered.distinct
      val t0 = System.nanoTime()
      val hits =
        if (query.startsWith("bm25f:")) engine.searchTermsFielded(terms, 10)
        else if (query.startsWith("bm25fchamp:"))
          engine.searchTermsFieldedChampion(terms, 10)
        else if (query.startsWith("proxchamp:"))
          engine.searchTermsProximityChampion(terms, 10)
        else if (query.startsWith("prox:")) engine.searchTermsProximity(terms, 10)
        else if (query.startsWith("ql:")) engine.searchTermsQl(terms, 10)
        else if (query.startsWith("phrase:")) engine.searchPhrase(ordered, 10)
        else engine.searchTermsChampion(terms, 10)
      val dt = (System.nanoTime() - t0) / 1e9
      val label = if (query.startsWith("bm25f:")) "BM25F"
        else if (query.startsWith("bm25fchamp:")) "BM25F-Champion"
        else if (query.startsWith("proxchamp:")) "Proximity-Champion"
        else if (query.startsWith("prox:")) "Proximity"
        else if (query.startsWith("ql:")) "QL"
        else if (query.startsWith("phrase:")) "Phrase-BM25"
        else "Champion"
      println(s"""$label Query: "$q" -> ${hits.size} results in ${f"$dt%.3f"} s""")
      hits.zipWithIndex.foreach { case (h, i) =>
        println(f"${i + 1}%2d. score=${h.score}%.4f docId=${h.docId}")
      }
    } else {
      val engine = new SearchEngine(spark, indexDir, chunkDocs)
      val t0 = System.nanoTime()
      val hits = engine.search(query)
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"""Query: "$query" -> ${hits.size} results in ${f"$dt%.3f"} s""")
      hits.zipWithIndex.foreach { case (h, i) =>
        println(f"${i + 1}%2d. score=${h.score}%-6d docId=${h.docId}%-5d ${h.url} | ${h.title}")
      }
    }
    spark.stop()
  }
}
