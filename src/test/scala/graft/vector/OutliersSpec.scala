package graft.vector

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("farthest-from-centroid ranks and mean ratio (hand-computed)") {
    // label 0: q = (0,0,0,4000) at scale 1e4 → t_i = 4q_i − S, S = 4000:
    //   t = (−4000,−4000,−4000,12000) → D = (16e6,16e6,16e6,144e6)
    //   tot = 192e6; ratio = 1000·D·4/192e6 → 3000 and 333 (floor)
    val d = Seq(
      (1L, Seq(0.0f), 0), (2L, Seq(0.0f), 0), (3L, Seq(0.0f), 0), (4L, Seq(0.4f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Outliers.perClassOutliers(d, "vec_id", "embedding", "label", topK = 2)
      .select("label", "vec_id", "dist2n", "ratio_permille")
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (-r._3, r._2))
    assert(out.toSeq === Seq(
      (0L, 4L, 144000000L, 3000L),
      (0L, 1L, 16000000L, 333L)))  // tie among 1,2,3 → smallest id
  }

  test("labels rank independently") {
    val d = Seq(
      (1L, Seq(0.0f), 0), (2L, Seq(0.3f), 0),
      (3L, Seq(0.0f), 1), (4L, Seq(-0.3f), 1), (5L, Seq(0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Outliers.perClassOutliers(d, "vec_id", "embedding", "label", topK = 1)
      .select("label", "vec_id").as[(Long, Long)].collect().sortBy(_._1)
    // label 0: symmetric pair — both D equal, tie → id 1
    // label 1: the -0.3 point is farthest from the (0,0,-0.3) centroid
    assert(out.toSeq === Seq((0L, 1L), (1L, 4L)))
  }

  test("unrepresentable dist2n fails loudly at the long cast, never wraps") {
    // quantScale 1e9 makes t = n·qv − S reach ±6e9, t² = 3.6e19 > Long.Max:
    // the DECIMAL(38,0) square-and-sum is exact and only the final narrowing
    // cast fails (ANSI), instead of silently wrapping mid-aggregation
    val d = Seq((1L, Seq(3.0f), 0), (2L, Seq(-3.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val ex = intercept[Exception] {
      Outliers.perClassOutliers(d, "vec_id", "embedding", "label", topK = 1,
        quantScale = 1e9).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("cast") ||
      ex.getMessage.toLowerCase.contains("overflow"),
      s"expected a loud cast/overflow failure, got: ${ex.getMessage}")
  }

  test("top-k never exceeds class size; ratio is monotone in distance") {
    val d = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = Outliers.perClassOutliers(d, "vec_id", "embedding", "label", topK = 5)
      .select("label", "vec_id", "dist2n", "ratio_permille")
      .as[(Long, Long, Long, Long)].collect()
    val byLabel = out.groupBy(_._1)
    assert(byLabel.forall(_._2.length <= 5))
    assert(byLabel.keySet === (0L to 9L).toSet)
    // top-5 of a class all sit ABOVE the class mean (ratio > 1000) on
    // concentrated embeddings, and ratio must order exactly like dist2n
    byLabel.values.foreach { rows =>
      val sorted = rows.sortBy(-_._3)
      assert(sorted.forall(_._4 > 1000L), s"top-5 below class mean: ${sorted.toSeq}")
      val ratios = sorted.map(_._4).toSeq
      assert(ratios === ratios.sorted.reverse, s"ratio not monotone: $ratios")
    }
  }
}
