package graft.vector

import graft.SparkSpec

class ClusterQualitySpec extends SparkSpec {
  import spark.implicits._

  test("well-separated clusters score near +1; mixed labels go negative") {
    val good = Seq(
      (1L, Seq(0.0f), 0), (2L, Seq(0.1f), 0),
      (3L, Seq(1.0f), 1), (4L, Seq(1.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val s1 = ClusterQuality.silhouette(good, "vec_id", "embedding", "label")
      .select("silhouette").as[Double].collect()
    assert(s1.length === 4 && s1.forall(_ > 0.9), s1.toSeq.toString)

    // same points, labels interleaved: every point's nearest neighbour is
    // now in the OTHER class → silhouettes negative
    val bad = Seq(
      (1L, Seq(0.0f), 0), (2L, Seq(0.1f), 1),
      (3L, Seq(1.0f), 0), (4L, Seq(1.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val s2 = ClusterQuality.silhouette(bad, "vec_id", "embedding", "label")
      .select("silhouette").as[Double].collect()
    assert(s2.forall(_ < 0), s2.toSeq.toString)
  }

  test("hand-computed: a excludes self, b averages the full other class") {
    // label0 = {0, 0.1}, label1 = {1.0}: for point 1 (q=0):
    //   a = d²(0,1000)/1 = 1e6; b = d²(0,10000)/1 = 1e8
    //   silhouette = (1e8 − 1e6)/1e8 = 0.99
    val d = Seq((1L, Seq(0.0f), 0), (2L, Seq(0.1f), 0), (3L, Seq(1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = ClusterQuality.silhouette(d, "vec_id", "embedding", "label")
      .select("vec_id", "a_own", "b_other", "silhouette")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((Some(1e6), Some(1e8), Some(0.99))))
    // singleton class: no same-class peer → a and silhouette NULL
    assert(out(3L)._1.isEmpty && out(3L)._3.isEmpty && out(3L)._2.nonEmpty)
  }

  test("key-like label column fails the bounded-class contract loudly") {
    // vec_id as the "label": 500 distinct values > maxClasses → the
    // classes×dims broadcast/expansion contract is violated and both
    // class-statistics operators must refuse, not silently blow up the plan
    val d = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val ex = intercept[IllegalArgumentException] {
      ClusterQuality.silhouette(d, "vec_id", "embedding", "vec_id",
        maxClasses = 100)
    }
    assert(ex.getMessage.contains("class"))
    val ex2 = intercept[IllegalArgumentException] {
      Outliers.perClassOutliers(d, "vec_id", "embedding", "vec_id",
        topK = 3, maxClasses = 100)
    }
    assert(ex2.getMessage.contains("class"))
  }

  test("fixture: per-class mean silhouette is finite and bounded") {
    val d = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = ClusterQuality.silhouette(d, "vec_id", "embedding", "label")
      .select("silhouette").as[Double].collect()
    assert(out.length === 500)
    assert(out.forall(s => s >= -1.0 && s <= 1.0))
  }
}
