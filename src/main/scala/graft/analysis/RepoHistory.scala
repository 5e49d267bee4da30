package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Version-history operators over the input_hint code table's `commit`
  * axis: a real source-code corpus is a LIVING set of repositories, so
  * the table the index is built from is itself the result of a
  * snapshot decision. These make that decision a first-class, oracle-
  * checked operator instead of an implicit assumption — and they are
  * the corpus-side twin of the index time-travel family
  * (graft.index.TimeTravel reads the INDEX as of a docId mark; these
  * read the WORKING TREE as of a commit timestamp).
  *
  * Input contract: one row per (repo, path, commit) with a totally-
  * ordered `commit_ts` per path; ties (same-second commits) break on
  * the lexicographically larger `commit` hex — pinned by spec and
  * replayed identically by the DuckDB oracles.
  *
  * Scale shape: every operator is ONE exchange keyed by (repo, path) —
  * the information floor for per-path decisions; nothing is ever
  * collected and no window runs over more than a path's own versions.
  */
object RepoHistory {

  private val ord = struct(col("commit_ts"), col("commit"))

  /** The current checkout: each path's latest version. */
  def latestSnapshot(versions: DataFrame): DataFrame =
    versions.groupBy(col("repo"), col("path"))
      .agg(max_by(
        struct(col("commit"), col("commit_ts"), col("content")), ord).as("__v"))
      .select(col("repo"), col("path"),
        col("__v.commit").as("commit"),
        col("__v.commit_ts").as("commit_ts"),
        col("__v.content").as("content"))

  /** The checkout as it stood at `ts`: the latest version at-or-before
    * the mark; paths born later vanish entirely (no row). The corpus
    * twin of `TimeTravel.docsAsOf`.
    */
  def snapshotAsOf(versions: DataFrame, ts: Long): DataFrame =
    latestSnapshot(versions.filter(col("commit_ts") <= ts))

  /** Per-path churn: version count, lifetime, distinct contents (a
    * rename-free edit counter — reverts collapse). The curation signal
    * for "hot" files a code-LM pipeline may sample differently.
    */
  def churnStats(versions: DataFrame): DataFrame =
    versions.groupBy(col("repo"), col("path"))
      .agg(count(lit(1)).as("n_versions"),
        min(col("commit_ts")).as("first_ts"),
        max(col("commit_ts")).as("last_ts"),
        countDistinct(col("content")).as("n_distinct_contents"))

  /** The incremental re-index feed: paths whose LATEST version landed
    * strictly after `tsLo` — exactly the delta a daily
    * `IndexBuilder.appendBuild` run consumes. Note the latest-version
    * semantics: a path edited before AND after the mark appears once,
    * with its newest content.
    */
  def changedSince(versions: DataFrame, tsLo: Long): DataFrame =
    latestSnapshot(versions).filter(col("commit_ts") > tsLo)
}
