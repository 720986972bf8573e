package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("qid", "cid", "rank")

  private val exact = frame((1 to 10).map(i => (1L, i.toLong, i)))

  test("identical rankings score exactly 1000 permille") {
    val out = RankEval.ndcg(exact, exact, k = 10)
      .select("n_hits", "ndcg_permille")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((10L, 1000L)))
  }

  test("full recall in reversed order scores strictly below 1000") {
    val rev = frame((1 to 10).map(i => (1L, i.toLong, 11 - i)))
    val out = RankEval.ndcg(exact, rev, k = 10).collect().head
    assert(out.getLong(1) === 10L)          // recall is perfect …
    assert(out.getLong(4) < 1000L)          // … but NDCG sees the order
  }

  test("disjoint results score zero") {
    val far = frame((1 to 10).map(i => (1L, 100L + i, i)))
    val out = RankEval.ndcg(exact, far, k = 10).collect().head
    assert(out.getLong(1) === 0L && out.getLong(2) === 0L &&
      out.getLong(4) === 0L)
  }

  test("misuse fails loudly: k out of range") {
    intercept[IllegalArgumentException](RankEval.ndcg(exact, exact, k = 0))
  }
}
