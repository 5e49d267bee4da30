package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.IndexStore
import graft.plans.GraftExpressions

/** Search-result facet counts — the results-page sidebar ("12 hits in
  * org7/proj7, 9 in org3/proj3 …") the reference front-end lacks but
  * every search product ships. Counts the docs matching a CONJUNCTIVE
  * term set, grouped by a facet derived from the doc row.
  *
  * Plan shape (the SearchEngine doc-resolve pattern,
  * SearchEngine.scala:231-242): the postings scan is term-pushdown'd to
  * the query's rows only; hit (chunk, docId) pairs come from decoding
  * just those blobs; the QUALIFYING chunk list (a small driver collect —
  * ≤ one id per chunk) partition-prunes the docs scan, and the
  * hit set joins BROADCAST — the corpus-sized docs table never
  * shuffles, and non-matching chunk partitions are never opened.
  */
object Facets {

  /** The repo facet: first two '/'-segments of the doc url
    * (Corpus.url = repo + "/" + path + "@" + commit, repo itself being
    * org/proj).
    */
  def repoFacet: Column = substring_index(col("url"), "/", 2).as("facet")

  /** Docs containing ALL `terms` (body terms, lowercase — the frozen
    * tokenizer's vocabulary), as (chunk, docId) pairs.
    */
  private def conjunctiveHits(spark: SparkSession, idxDir: String,
                              terms: Seq[String]): DataFrame =
    IndexStore.readPostings(spark, idxDir).toDF()
      .filter(col("term").isin(terms.distinct: _*))
      .select(col("chunk"), col("term"),
        explode(GraftExpressions.posting_doc_ids(col("df"), col("postingsBlob")))
          .as("docId"))
      .groupBy(col("chunk"), col("docId"))
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === terms.distinct.size)
      .select(col("chunk"), col("docId"))

  /** Facet counts over the conjunctive hit set. `facet` defaults to
    * [[repoFacet]]; any Column over the doc row works (lang is not in
    * the doc store — the reference's DocumentData has no language field,
    * SURVEY.md §1.1 — so path/url-derived facets are the native ones).
    * The facet column is re-aliased to "facet" here, so the output
    * schema is (facet, n_docs) regardless of the caller's expression —
    * the empty-result schema and [[federatedFacets]]'s gather rely on it.
    */
  def conjunctiveFacets(spark: SparkSession, idxDir: String,
                        terms: Seq[String],
                        facet: Column = repoFacet): DataFrame = {
    require(terms.nonEmpty, "facets need at least one term")
    val hits = conjunctiveHits(spark, idxDir, terms)
    val qualifying = hits.select(col("chunk")).distinct()
      .collect().map(_.getLong(0)).toSeq
    if (qualifying.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("facet",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_docs",
            org.apache.spark.sql.types.LongType, nullable = false))))
    IndexStore.readDocs(spark, idxDir).toDF()
      .filter(col("chunk").isin(qualifying: _*))
      .join(broadcast(hits), Seq("chunk", "docId"))
      .groupBy(facet.as("facet"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Federated facet counts over K shard indexes: a facet histogram is
    * ADDITIVE over disjoint doc sets, so the scatter runs each shard's
    * chunk-pruned [[conjunctiveFacets]] and the gather is one facet-keyed
    * sum — no docId remap, no stats exchange (counts are absolute). The
    * one facet the shard boundary could corrupt is a facet DERIVED from
    * docIds; url/path-derived facets (the native ones) are split-proof.
    * FederationSpec pins equality with the consolidated merged index.
    */
  def federatedFacets(spark: SparkSession, shards: Seq[String],
                      terms: Seq[String],
                      facet: Column = repoFacet): DataFrame = {
    require(shards.nonEmpty, "federatedFacets: need at least one shard")
    // concurrent scatter: conjunctiveFacets runs its chunk-resolve job
    // eagerly, so building the per-shard frames in parallel overlaps
    // those jobs (results stay in shard order; the sum is commutative)
    Federation.scatter(shards.map(d =>
        () => conjunctiveFacets(spark, d, terms, facet)))
      .reduce(_ unionByName _)
      .groupBy(col("facet")).agg(sum(col("n_docs")).as("n_docs"))
  }
}
