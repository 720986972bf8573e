package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TwoSampleSpec extends SparkSpec {
  import spark.implicits._

  private def brute(a: Seq[Long], b: Seq[Long]): (Long, Long, Long, Long) = {
    // U2 = 2·U = 2·#(x>y) + #(x=y) over the cross pairs; KS cross-multiplied
    val u2 = (for (x <- a; y <- b) yield {
      if (x > y) 2L else if (x == y) 1L else 0L
    }).sum
    val vs = (a ++ b).distinct.sorted
    val diffs = vs.map { v =>
      val da = a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size
      (math.abs(da), v)
    }
    val ksx = diffs.map(_._1).max
    val at = diffs.filter(_._1 == ksx).map(_._2).min
    (u2, ksx, at, a.size.toLong * b.size)
  }

  private def run(a: Seq[Long], b: Seq[Long]) = {
    val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "isa")
    TwoSample.mannWhitneyKs(df, col("isa"), col("v"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
  }

  test("U2, effect sizes and KS match the brute-force cross-pair reference") {
    val a = Seq(5L, 7L, 7L, 12L, 3L, 9L)
    val b = Seq(4L, 7L, 8L, 2L, 2L, 10L, 11L)
    val (u2, ksx, at, nab) = brute(a, b)
    val (na, nb, auc, rb, ks, ksAt) = run(a, b)
    assert((na, nb) === (6L, 7L))
    assert(auc === 500L * u2 / nab)
    // truncation toward zero for the possibly-negative rank-biserial
    assert(rb === BigInt(1000) * (u2 - nab) / nab)
    assert(ks === 1000L * ksx / nab)
    assert(ksAt === at)
  }

  test("identical samples: AUC 500, rank-biserial 0, KS 0") {
    val s = Seq(1L, 2L, 3L, 4L, 5L)
    val (_, _, auc, rb, ks, _) = run(s, s)
    assert((auc, rb, ks) === (500L, 0L, 0L))
  }

  test("fully separated samples: AUC 1000, KS 1000") {
    val (_, _, auc, rb, ks, ksAt) = run(Seq(11L, 12L, 13L), Seq(1L, 2L, 3L))
    assert((auc, rb, ks) === (1000L, 1000L, 1000L))
    assert(ksAt === 3L) // the whole B mass sits at or below 3
  }

  test("histogram wider than the cap refuses loudly") {
    val df = (1L to 50L).map(v => (v, v % 2 == 0)).toDF("v", "isa")
    val e = intercept[IllegalArgumentException] {
      TwoSample.mannWhitneyKs(df, col("isa"), col("v"),
        maxDistinctValues = 10L)
    }
    assert(e.getMessage.contains("distinct values"))
  }
}
