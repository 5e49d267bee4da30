package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analysis.TextAnalysis
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

    section("repetition: window partitioning satisfies downstream groupBys") {
      // hashpartitioning(doc_id) from the shingle window must satisfy both
      // groupBy(doc_id, shingle) and groupBy(doc_id) -> ONE exchange total
      TextAnalysis.repetition(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    }

    section("stats read is column-pruned (no blob)") {
      IndexStore.readPostings(spark, out).toDF().groupBy($"chunk")
        .agg(count(lit(1)).as("uniqueTerms"))
    }
    spark.stop()
  }
}
