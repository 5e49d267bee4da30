package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexStore}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry takes (spark, sfDir) and returns a DataFrame whose
  * rows the driver compares against `oracleSql` run by DuckDB over the
  * same parquet tables (views named after the files: documents, lineitem,
  * ...). Column names are aligned on both sides; floating-point columns
  * are rounded to fixed decimals so cross-engine hashes match.
  */
object SparkEntry {

  /** Shared tokenization SQL used by the DuckDB oracles: must reproduce
    * graft.tokenizer.Tokenizer.bodyTokens exactly (split on whitespace,
    * all-alpha, lowercase, length < 20; positions = 1-based over kept
    * tokens in order).
    */
  private val duckToks =
    """WITH toks AS (
      |  SELECT doc_id, lower(tok) AS term,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS pos
      |  FROM (
      |    SELECT doc_id,
      |           unnest(string_split_regex(text, '\s+')) AS tok,
      |           generate_subscripts(string_split_regex(text, '\s+'), 1) AS idx
      |    FROM documents
      |  )
      |  WHERE regexp_matches(tok, '^[A-Za-z]+$') AND length(tok) < 20
      |)""".stripMargin

  /** Spark-side body-token table matching duckToks: (doc_id, term, pos). */
  private def sparkToks(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // filter + posexplode keeps the plan in whole-stage codegen; positions
    // are 1-based over kept tokens, matching the index tokenizer.
    docs.select(col("doc_id"),
        posexplode(filter(split(col("text"), "\\s+"),
          t => t.rlike("^[A-Za-z]+$") && length(t) < 20)))
      .select(col("doc_id"), lower(col("col")).as("term"),
        (col("pos") + 1).cast("long").as("pos"))
  }

  /** Flagship: full index build over the input-hint-shaped corpus, then a
    * reference-scored search through the whole query stack (tokenize ->
    * typed aggregation -> compressed chunks -> persisted store -> parse ->
    * chunk-pruned cogroup ranking -> merged top-k).
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_entry_idx").toString
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new graft.engine.SearchEngine(spark, out, chunkCapacity = 200)
    engine.search("spark merge sort").toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A3 analog: per-term df/tf over the frozen tokenization
    "q_term_stats" -> ((s, dir) => {
      sparkToks(s, dir)
        .groupBy(col("term"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(desc("tf"), asc("term"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_term_stats" ->
      (duckToks +
        """
          |SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
          |FROM toks GROUP BY term ORDER BY tf DESC, term""".stripMargin)
  )
}
