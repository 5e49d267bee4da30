package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexStore}
import graft.plans.GraftExtensions

/** SQL surface over a persisted index via the custom Catalyst functions:
  * runMain graft.tools.SqlDemo <sfDir> <indexDir> "<sql>"
  * Builds the index if absent; registers posting_doc_ids / posting_tfs /
  * posting_positions / graft_tokenize; view `postings` is available.
  */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, indexDir, sql) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!IndexBuilder.pathExists(spark, s"$indexDir/postings"))
      IndexBuilder.build(spark, Corpus.fromDocumentsParquet(spark, sfDir),
        indexDir, IndexBuilder.BuildConfig(chunkDocs = 200))
    IndexStore.readPostings(spark, indexDir).toDF().createOrReplaceTempView("postings")
    IndexStore.readDocs(spark, indexDir).toDF().createOrReplaceTempView("docs")
    spark.sql(sql).show(50, truncate = false)
    spark.stop()
  }
}
