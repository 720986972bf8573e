package graft.relational

import graft.SparkSpec

class SkewProfileSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed shares, uniform multiples, and salt factor") {
    // keys: a×6, b×2, c×1, d×1 → total 10, n_keys 4, max 6
    val d = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val out = SkewProfile.hotKeys(d, "k", topK = 2)
      .select("key", "cnt", "share_permille", "uniform_x_permille",
        "n_keys", "total", "salt_factor")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(-_._2)
    // a: share 600‰, uniform× = 1000·6·4/10 = 2400‰; salt = ceil(24/10) = 3
    assert(out(0) === (("a", 6L, 600L, 2400L, 4L, 10L, 3L)))
    assert(out(1) === (("b", 2L, 200L, 800L, 4L, 10L, 3L)))
  }

  test("uniform keys report ~1000 permille and salt factor 1") {
    val d = (1 to 40).map(i => s"k${i % 4}").toDF("k")
    val out = SkewProfile.hotKeys(d, "k", topK = 4)
      .select("uniform_x_permille", "salt_factor").as[(Long, Long)].collect()
    assert(out.forall(_ == ((1000L, 1L))))
  }
}
