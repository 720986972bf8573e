package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // orthonormal-ish toy vectors: c1 and c2 nearly identical, c3 orthogonal
  private lazy val vecs = Seq(
    (1L, Array(1f, 0f, 0f)),
    (2L, Array(0.999f, 0.04f, 0f)),
    (3L, Array(0f, 1f, 0f)))
    .toDF("vec_id", "embedding")

  test("diversity beats raw rank: the near-duplicate drops behind") {
    // relevance order: c1 (0.99) > c2 (0.98) > c3 (0.50); plain top-2 is
    // {c1, c2}, but MMR picks c3 second — mmr(c2) = (0.98 − ~1.0)/2 < 0,
    // mmr(c3) = (0.50 − 0)/2 = 0.25
    val pool = Seq((100L, 1L, 0.99), (100L, 2L, 0.98), (100L, 3L, 0.50))
      .toDF("qid", "cid", "score")
    val out = Mmr.rerank(pool, vecs, "vec_id", "embedding", select = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._2, r._3)) === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("ties break toward the smaller candidate id") {
    val same = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(1f, 0f, 0f)),
      (3L, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val pool = Seq((9L, 3L, 0.8), (9L, 1L, 0.8), (9L, 2L, 0.8))
      .toDF("qid", "cid", "score")
    val out = Mmr.rerank(pool, same, "vec_id", "embedding", select = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._3) === Seq(1L, 2L, 3L))
  }

  test("select outside the pinned-round contract is refused") {
    val pool = Seq((1L, 1L, 0.5)).toDF("qid", "cid", "score")
    intercept[IllegalArgumentException](
      Mmr.rerank(pool, vecs, "vec_id", "embedding", select = 0))
  }
}
