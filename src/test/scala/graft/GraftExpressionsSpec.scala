package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexStore}
import graft.plans.{GraftExpressions, GraftExtensions}

/** The custom Catalyst expressions must agree with the library decoders,
  * both through the Column API and through SQL after extension
  * registration.
  */
class GraftExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  lazy val indexDir: String = {
    val out = SparkTestBase.tempDir("graft-expr-idx")
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    out
  }

  test("posting_doc_ids / posting_tfs match PostingCodec.decode") {
    val row = IndexStore.readPostings(spark, indexDir).toDF()
      .filter(col("term") === "dup")
      .select(col("df"), col("postingsBlob"),
        GraftExpressions.posting_doc_ids(col("df"), col("postingsBlob")).as("ids"),
        GraftExpressions.posting_tfs(col("df"), col("postingsBlob")).as("tfs"))
      .collect().head
    val expected = graft.codec.PostingCodec.decode(row.getLong(0), row.getAs[Array[Byte]](1))
    assert(row.getSeq[Long](2) === expected.map(_._1).toSeq)
    val tfs = row.getSeq[org.apache.spark.sql.Row](3)
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(tfs === expected.map { case (d, p) => (d, p.length) }.toSeq)
  }

  test("SQL access to the index via registered functions") {
    GraftExtensions.register(spark)
    IndexStore.readPostings(spark, indexDir).toDF().createOrReplaceTempView("postings_v")
    val viaSql = spark.sql(
      """SELECT explode(posting_doc_ids(df, postingsBlob)) AS docId
        |FROM postings_v WHERE term = 'dup' AND chunk = 0""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val direct = IndexStore.readPostings(spark, indexDir)
      .filter(p => p.term == "dup" && p.chunk == 0L)
      .collect().flatMap(p =>
        graft.codec.PostingCodec.decode(p.df, p.postingsBlob).map(_._1)).toSeq
    assert(viaSql === direct && viaSql.nonEmpty)

    // positions of a specific doc
    val pos = spark.sql(
      s"""SELECT posting_positions(df, postingsBlob, ${direct.head}L) AS ps
         |FROM postings_v WHERE term = 'dup' AND chunk = 0""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(pos.nonEmpty)

    // frozen tokenizer through SQL
    val toks = spark.sql("SELECT graft_tokenize('The quick Brown fox42 x') AS t")
      .collect().head.getSeq[String](0)
    assert(toks === Seq("the", "quick", "brown", "x"))
  }

  test("withExtensions wiring: spark.sql.extensions session picks up functions") {
    // verify the extensions class itself applies cleanly
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // must not throw
  }
}
