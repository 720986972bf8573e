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

  test("weekly rollup from daily cells equals the direct weekly sketch, inside the bound") {
    // two weeks of per-day values; the rollup answers weekly quantiles
    // from daily CELLS only — assert (a) every error is inside the
    // one-sided sketch bound and (b) the rolled estimate equals a direct
    // quantileAudit run on the same weekly slices (merge = addition).
    val days = (0 until 14)
    val rows = days.flatMap { d =>
      (1 to 50).map { i =>
        val v = ((d * 50 + i).toLong * 2654435761L) % 100000L
        ("a", java.sql.Date.valueOf(java.time.LocalDate.of(1970, 1, 1).plusDays(d)), v)
      }
    }
    val df = rows.toDF("g", "day", "v")
    val out = DdSketch.rollupAudit(df, "g", "day", "v", Seq(500, 990))
      .as[(String, Long, Long, Long, Long, Long, Option[Long])].collect()
    assert(out.length === 4, "2 weeks x 2 quantiles")
    out.foreach { case (_, wk, q, n, est, exact, err) =>
      assert(n === 350L,
        s"wk=$wk q=$q: 7 days x 50 values per week, got $n")
      assert(est <= exact && exact * 16L < est * 17L || est == exact,
        s"wk=$wk q=$q: $est vs $exact escapes the sketch bound")
      assert(err.forall(e => e <= 0L && e > -63L),
        s"wk=$wk q=$q: err $err outside (-63, 0]")
    }
    // cross-check vs direct per-week sketches (epoch-day div 7 slicing)
    val direct = DdSketch.quantileAudit(
      df.withColumn("gw", concat(col("g"), lit(":"),
        expr("datediff(day, DATE '1970-01-01') div 7"))),
      "gw", "v", Seq(500, 990))
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => ((r._1, r._2), (r._4, r._5))).toMap
    out.foreach { case (g, wk, q, _, est, exact, _) =>
      assert(direct((s"$g:$wk", q)) === ((est, exact)),
        s"rollup disagrees with the direct weekly sketch at wk=$wk q=$q")
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
