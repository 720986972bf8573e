package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the retrieval queries beyond the oracle hash-match:
  * BM25's core monotonicities and RRF's fusion invariants, on the real
  * sf0.001 tables (the oracle proves value equality; these prove the
  * SEMANTICS a retrieval consumer relies on).
  */
class RetrievalSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("bm25_topk: positive scores, unique contiguous ranks, descending") {
    val rows = run("bm25_topk")
      .select("rk", "doc_id", "score").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val rks = rows.map(_.getLong(0))
    assert(rks.toSeq === (1L to rks.length))
    val scores = rows.map(_.getDouble(2))
    assert(scores.forall(_ > 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("bm25 ranks more query-term occurrences above fewer at similar length") {
    // top-ranked doc must contain at least one query term; the rank-1 doc's
    // query-term density should not be zero while any candidate's is positive
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val top = run("bm25_topk").select("doc_id").as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val qterms = Set("spark", "query", "table", "join")
    val hasTerm = docs.filter(col("doc_id").isInCollection(top))
      .select(col("doc_id"), split(col("text"), " ").as("ws")).collect()
      .map(r => r.getSeq[String](1).exists(qterms.contains))
    assert(hasTerm.forall(identity), "a top-20 BM25 doc contains no query term")
  }

  test("hybrid_rrf_topk: rrf equals the reciprocal-rank sum of its branches") {
    // union semantics: a doc shortlisted by only one branch keeps a NULL
    // rank in the other and that branch contributes 0 to the fusion
    val rows = run("hybrid_rrf_topk")
      .select("rk", "doc_id", "rb", "rc", "rrf").collect()
    assert(rows.nonEmpty)
    def term(r: org.apache.spark.sql.Row, i: Int): Double =
      if (r.isNullAt(i)) 0.0 else 1.0 / (60.0 + r.getLong(i))
    rows.foreach { r =>
      val expect = term(r, 2) + term(r, 3)
      assert(r.getDouble(4) === expect,
        s"rrf mismatch for doc ${r.getLong(1)}")
    }
    val rrfs = rows.map(_.getDouble(4))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
  }

  test("rrf prefers a doc ranked well in both branches over one good in one") {
    val rows = run("hybrid_rrf_topk")
      .select("doc_id", "rb", "rc", "rrf").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    // any doc with BOTH branch ranks strictly better than another's must
    // fuse strictly higher
    for (a <- rows; b <- rows
         if a.getLong(1) < b.getLong(1) && a.getLong(2) < b.getLong(2))
      assert(a.getDouble(3) > b.getDouble(3))
  }
}
