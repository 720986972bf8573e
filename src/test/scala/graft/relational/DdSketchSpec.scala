package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DdSketchSpec extends SparkSpec {
  import spark.implicits._

  test("singleton buckets below 16 make small domains exact") {
    val df = (0L to 15L).flatMap(v => Seq(("a", v), ("a", v)))
      .toDF("g", "v")
    val out = DdSketch.quantileAudit(df, "g", "v", Seq(500, 990))
      .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSeq
    // 32 rows over 0..15: r(500) = 16 → value 7; r(990) = 32 → value 15
    assert(out === Seq(
      ("a", 500L, 32L, 7L, 7L, Some(0L)),
      ("a", 990L, 32L, 15L, 15L, Some(0L))))
  }

  test("the estimate is a lower bound within one sub-step (<1/16 relative)") {
    val vals = (1 to 4000).map(i => ((i.toLong * 2654435761L) % 1000000L))
    val df = vals.map(("a", _)).toDF("g", "v")
    val out = DdSketch.quantileAudit(df, "g", "v",
      Seq(100, 250, 500, 750, 990))
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
    assert(out.length === 5)
    out.foreach { case (_, q, n, est, exact, _) =>
      assert(n === 4000L)
      assert(est <= exact, s"q=$q: estimate $est above exact $exact")
      // exact sits inside the estimate's bucket: exact < est·(1+1/16)
      assert(exact * 16L < est * 17L || est == exact,
        s"q=$q: exact $exact escapes the bucket of $est")
    }
  }

  test("bucket key replicates an independent reference on random values") {
    val vals = (1 to 500).map(i => ((i.toLong * 40503L) % 100000L))
    def refKey(v: Long): Long =
      if (v < 16) v
      else {
        val e = 64 - java.lang.Long.numberOfLeadingZeros(v)
        16L * e + (v >> (e - 5)) - 16L
      }
    val got = vals.map(("a", _)).toDF("g", "v")
      .select(col("v"),
        when(col("v") < 16L, col("v")).otherwise(expr(
          "16L * length(bin(v)) + (v div shiftleft(1L, length(bin(v)) - 5) - 16L)"))
          .as("k"))
      .as[(Long, Long)].collect()
    got.foreach { case (v, k) => assert(k === refKey(v), s"v=$v") }
  }

  test("misuse fails loudly: negative values, unbounded exact domain") {
    val neg = Seq(("a", -1L)).toDF("g", "v")
    val e = intercept[IllegalArgumentException](
      DdSketch.quantileAudit(neg, "g", "v"))
    assert(e.getMessage.contains("non-negative"))
    val wide = (1L to 100L).map(("a", _)).toDF("g", "v")
    intercept[IllegalArgumentException](
      DdSketch.quantileAudit(wide, "g", "v", maxDistinct = 10))
  }
}
