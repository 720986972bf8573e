package graft.relational

import graft.SparkSpec

class QuantileRankSpec extends SparkSpec {
  import spark.implicits._

  test("permille rank is the strictly-below CDF; ties share a rank") {
    val d = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L), (5L, 40L))
      .toDF("id", "v")
    val out = QuantileRank.permilleRank(d, "v", "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(out(1L) === 0L)               // nothing below
    assert(out(2L) === 200L)             // 1 of 5 below
    assert(out(3L) === 200L)             // tie shares
    assert(out(4L) === 600L)             // 3 below
    assert(out(5L) === 800L)             // 4 below
  }

  test("ranks are monotone in the value and bounded in [0, 1000)") {
    val d = (1L to 97L).map(i => (i, (i * 7919) % 31)).toDF("id", "v")
    val out = QuantileRank.permilleRank(d, "v", "r")
      .select("v", "r").as[(Long, Long)].collect()
    assert(out.forall { case (_, r) => r >= 0 && r < 1000 })
    val sorted = out.sortBy(_._1)
    assert(sorted.map(_._2).toSeq === sorted.map(_._2).sorted)
  }

  test("NULL values fail loudly instead of vanishing from the output") {
    val d = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      QuantileRank.permilleRank(d, "v", "r")
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("a continuous (unbounded-distinct) domain fails the broadcast guard") {
    val d = (1L to 50L).map(i => (i, i * 1.000001)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      QuantileRank.permilleRank(d, "v", "r", maxDistinct = 10)
    }
    assert(e.getMessage.contains("distinct"))
  }
}
