package graft.vector

import graft.SparkSpec

class AnisotropySpec extends SparkSpec {
  import spark.implicits._

  test("identity: mean pairwise dot equals the brute-force cross-pair mean") {
    val vecs = Seq(
      Seq(1.0f, 2.0f, -1.0f), Seq(0.5f, -0.25f, 3.0f),
      Seq(-2.0f, 1.0f, 0.0f), Seq(0.1f, 0.1f, 0.1f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 10000).toLong))
    val pairs = for (i <- q.indices; j <- q.indices if i < j)
      yield (q(i), q(j)).zipped.map(_ * _).sum
    val self = q.map(v => v.map(x => x * x).sum)
    val n = q.size.toLong
    val got = Anisotropy.audit(df, "embedding", dim = 3)
      .select("n_vectors", "mean_self_dot", "mean_pair_dot")
      .as[(Long, Long, Long)].collect().head
    assert(got._1 === n)
    assert(got._2 === self.sum / n)
    // mean over ORDERED pairs = 2·Σ_{i<j} / (n(n−1)) — BigInt truncation
    assert(got._3 ===
      (BigInt(2) * BigInt(pairs.sum) / (BigInt(n) * (n - 1))).toLong)
  }

  test("perfectly collapsed space scores 1000 permille, ragged vectors excluded") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(1.0f, 0.0f)),
      (4L, Seq(9.0f))) // ragged — must be filtered, not poison the sums
      .toDF("vec_id", "embedding")
    val got = Anisotropy.audit(df, "embedding", dim = 2)
      .select("n_vectors", "anisotropy_permille")
      .as[(Long, Long)].collect().head
    assert(got === ((3L, 1000L)))
  }
}
