package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  test("dyadic chart equals the sequential lambda=1/2 recurrence") {
    val xs = Seq(100L, 120L, 80L, 90L, 200L, 50L)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("key", "t", "x")
    val got = Ewma.dyadicChart(df, Seq("key"), "t", "x", 500L)
      .select("seq", "ewma_milli", "dev_permille", "alarm")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // sequential reference in exact rationals: s_t = (x_t + s_{t-1}) / 2
    // carried as (numerator, power-of-two denominator)
    var num = BigInt(xs.head); var pow = 0
    val ref = xs.zipWithIndex.map { case (x, i) =>
      if (i > 0) { num = num + BigInt(x) * (BigInt(1) << (i - 1)); pow = i }
      val ewmaMilli = (BigInt(1000) * num / (BigInt(1) << pow)).toLong
      val dev = if (i == 0) 0L
        else {
          val prevNum = num - BigInt(x) * (BigInt(1) << (i - 1))
          ((BigInt(1000) * (BigInt(x) * (BigInt(1) << (i - 1)) - prevNum))
            / prevNum).toLong
        }
      (i + 1L, ewmaMilli, dev, i > 0 && math.abs(dev) > 500)
    }
    assert(got.toSeq === ref)
  }

  test("first point never alarms; a doubled rate does") {
    val df = Seq(("k", 1L, 100L), ("k", 2L, 230L)).toDF("key", "t", "x")
    val rows = Ewma.dyadicChart(df, Seq("key"), "t", "x", 500L)
      .select("seq", "dev_permille", "alarm")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows(0) === ((1L, 0L, false)))
    assert(rows(1)._2 === 1300L && rows(1)._3)
  }

  test("series past 55 points refuses loudly instead of wrapping") {
    val df = (1L to 60L).map(i => ("k", i, 10L)).toDF("key", "t", "x")
    val e = intercept[Exception] {
      Ewma.dyadicChart(df, Seq("key"), "t", "x", 500L).collect()
    }
    assert(e.getMessage.contains("dyadic") ||
      Option(e.getCause).exists(_.getMessage.contains("dyadic")))
  }

  test("guard survives pruning: selecting only dev_permille/alarm still raises") {
    // a consumer that never touches ewma_milli prunes that column (and any
    // guard riding only it) out of the plan — the residual branch must carry
    // its own raise, or past-55 charts go silently wrong on wrapped weights
    val df = (1L to 60L).map(i => ("k", i, 10L)).toDF("key", "t", "x")
    val e = intercept[Exception] {
      Ewma.dyadicChart(df, Seq("key"), "t", "x", 500L)
        .select("dev_permille", "alarm").collect()
    }
    assert(e.getMessage.contains("dyadic") ||
      Option(e.getCause).exists(_.getMessage.contains("dyadic")))
  }
}
