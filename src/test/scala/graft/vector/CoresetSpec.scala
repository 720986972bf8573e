package graft.vector

import graft.SparkSpec

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def df(vs: (Long, Seq[Float])*) =
    vs.toDF("vec_id", "embedding")

  test("greedy trajectory on a 1-D line: farthest-point order") {
    // points at 0.0, 0.1, 0.5, -0.5 (quantized ×1e6)
    val d = df(1L -> Seq(0.0f), 2L -> Seq(0.1f), 3L -> Seq(0.5f), 4L -> Seq(-0.5f))
    val out = Coreset.kCenterGreedy(d, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // seed: |±0.5| tie on squared norm → smaller id (3); then -0.5 is
    // farthest from 0.5 (dist² = 1e12); then 0.0 (min-dist 0.25e12 to
    // either pole) beats 0.1 (0.16e12 to 0.5)
    assert(out.map(_._2).toSeq === Seq(3L, 4L, 1L))
    assert(out(0)._3 === 250000000000L)       // seed norm² = (5e5)²
    assert(out(1)._3 === 1000000000000L)      // (1e6)²
    assert(out(2)._3 === 250000000000L)       // (5e5)²
  }

  test("selection scores are non-increasing after the seed") {
    val d = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = Coreset.kCenterGreedy(d, "vec_id", "embedding", k = 6)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val scores = out.drop(1).map(_._3).toSeq
    assert(scores === scores.sorted.reverse, s"not non-increasing: $scores")
    assert(out.map(_._2).distinct.length === 6, "picks must be distinct")
  }

  test("landed-distance variant is bit-identical to the fold form") {
    // landEvery truncates the least-fold chain with durable landings every m
    // rounds — exact integers land, so the trajectory must match exactly,
    // at several landing cadences including m=1 (land every round)
    val d = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val fold = Coreset.kCenterGreedy(d, "vec_id", "embedding", k = 10)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    for (m <- Seq(1, 3, 4)) {
      val landed = Coreset.kCenterGreedy(d, "vec_id", "embedding", k = 10,
        landEvery = m)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(landed === fold, s"landEvery=$m diverged from the fold form")
    }
  }

  test("k=1 returns only the seed") {
    val d = df(9L -> Seq(0.2f, 0.1f))
    val out = Coreset.kCenterGreedy(d, "vec_id", "embedding", k = 1)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 9L, 200000L * 200000L + 100000L * 100000L)))
  }
}
