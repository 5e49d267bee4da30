package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.RankEval

/** TREC-style ranking eval (analysis.RankEval): hand-computed nDCG /
  * MRR / P / recall fixtures, cutoff semantics, graded ideal ordering,
  * and the full-outer fold for one-sided queries.
  */
class RankEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def runsDf(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", "rank")
  }
  private def qrelsDf(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", "rel")
  }
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def g(rel: Long, rank: Long) =
    (math.pow(2.0, rel.toDouble) - 1.0) / (math.log(rank + 1.0) / math.log(2.0))

  test("hand-computed graded nDCG, MRR, P@k, recall@k") {
    // q1: ranked docs 10,20,30 with rels 1,0,3; one unretrieved rel doc 40(rel 2)
    val runs = runsDf(("q1", 10L, 1L), ("q1", 20L, 2L), ("q1", 30L, 3L))
    val qrels = qrelsDf(("q1", 10L, 1L), ("q1", 30L, 3L), ("q1", 40L, 2L))
    val out = RankEval.evaluate(runs, qrels, k = 3).collect()
    assert(out.length === 1)
    val row = out.head
    val dcg = g(1, 1) + g(3, 3)
    // ideal order by rel desc: 30(3), 40(2), 10(1)
    val idcg = g(3, 1) + g(2, 2) + g(1, 3)
    assert(row.getDouble(1) === r6(dcg / idcg))      // ndcg
    assert(row.getDouble(2) === 1.0)                 // first rel at rank 1
    assert(row.getDouble(3) === r6(2.0 / 3.0))       // p@3
    assert(row.getDouble(4) === r6(2.0 / 3.0))       // recall: 2 of 3 rel
  }

  test("cutoff k drops deeper hits from metrics AND ideal") {
    val runs = runsDf(("q1", 10L, 1L), ("q1", 30L, 4L))
    val qrels = qrelsDf(("q1", 10L, 1L), ("q1", 30L, 3L))
    val out = RankEval.evaluate(runs, qrels, k = 2).collect().head
    val dcg = g(1, 1)                 // doc 30 at rank 4 is past the cutoff
    val idcg = g(3, 1) + g(1, 2)      // ideal still fills k=2 slots
    assert(out.getDouble(1) === r6(dcg / idcg))
    assert(out.getDouble(2) === 1.0)
    assert(out.getDouble(3) === 0.5)  // 1 hit / k=2
    assert(out.getDouble(4) === 0.5)  // 1 of 2 rel
  }

  test("no relevant retrieved -> rr 0; first rel mid-list -> 1/rank") {
    val runs = runsDf(("q1", 10L, 1L), ("q1", 20L, 2L), ("q1", 30L, 3L),
      ("q2", 50L, 1L), ("q2", 60L, 2L))
    val qrels = qrelsDf(("q1", 30L, 2L), ("q2", 99L, 1L))
    val out = RankEval.evaluate(runs, qrels, k = 3).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("q1").getDouble(2) === r6(1.0 / 3.0))
    assert(out("q2").getDouble(1) === 0.0) // no rel retrieved -> ndcg 0
    assert(out("q2").getDouble(2) === 0.0)
    assert(out("q2").getDouble(4) === 0.0)
  }

  test("full-outer fold: run-only and qrels-only queries both get zero rows") {
    val runs = runsDf(("only_run", 1L, 1L))
    val qrels = qrelsDf(("only_rel", 2L, 3L))
    val out = RankEval.evaluate(runs, qrels, k = 5).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("only_run") === ((0.0, 0.0, 0.0, 0.0)))
    assert(out("only_rel") === ((0.0, 0.0, 0.0, 0.0)))
  }

  test("perfect ranking scores ndcg 1 regardless of grades") {
    val runs = runsDf(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
    val qrels = qrelsDf(("q", 1L, 3L), ("q", 2L, 2L), ("q", 3L, 1L))
    val out = RankEval.evaluate(runs, qrels, k = 3).collect().head
    assert(out.getDouble(1) === 1.0)
    assert(out.getDouble(4) === 1.0)
  }
}
