package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized parity for the extension-wave statistics: each operator's
  * distributed answer must equal a naive single-threaded reference
  * implementation on random discrete fixtures (fixed seeds — failures
  * reproduce). The house randomized-parity discipline: hand specs pin
  * chosen edge cases, these pin the general case.
  */
class ExtensionParitySpec extends SparkSpec {
  import spark.implicits._

  test("spearman equals the naive tie-averaged reference on random data") {
    val rnd = new Random(41)
    val data = Seq.fill(300)((rnd.nextInt(12).toLong, rnd.nextInt(9).toLong))
    def avgRanks(v: Seq[Long]): Map[Long, Double] = {
      val sorted = v.sorted.zipWithIndex.map { case (x, i) => (x, i + 1.0) }
      sorted.groupBy(_._1).map { case (x, xs) =>
        x -> xs.map(_._2).sum / xs.size
      }
    }
    val rx = avgRanks(data.map(_._1)); val ry = avgRanks(data.map(_._2))
    val xs = data.map(d => rx(d._1)); val ys = data.map(d => ry(d._2))
    val n = data.size.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum) *
      math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
    val want = num / den
    val got = Correlation.spearman(data.toDF("x", "y"), "x", "y")
      .as[(Long, Double)].collect().head._2
    assert(math.abs(got - want) < 1e-9, s"got $got want $want")
  }

  test("gini equals the naive tie-averaged reference on random weights") {
    val rnd = new Random(42)
    val w = Seq.fill(200)(rnd.nextInt(20).toLong + 1L)
    val sorted = w.sorted.zipWithIndex.map { case (x, i) => (x, i + 1.0) }
    val ranks = sorted.groupBy(_._1).map { case (x, xs) =>
      x -> xs.map(_._2).sum / xs.size
    }
    val n = w.size.toDouble; val t = w.sum.toDouble
    val srw = w.map(x => ranks(x) * x).sum
    val wantMicro = math.floor(1e6 * (2.0 * srw - (n + 1) * t) / (n * t)).toLong
    val got = Concentration.gini(w.toDF("w"), col("w"))
      .as[(Long, Long, Long, Long)].collect().head._3
    assert(got === wantMicro, s"got $got want $wantMicro")
  }

  test("theil-sen equals the naive median-of-slopes on a random series") {
    val rnd = new Random(43)
    val days = (1 to 25).map(d => (d, rnd.nextInt(30) + 1))
    val slopes = (for {
      (x1, y1) <- days; (x2, y2) <- days if x1 < x2
    } yield 1000000L * (y2 - y1) / (x2 - x1)).sorted
    // careful: integer / truncates toward zero like the operator's div
    val want = slopes((slopes.size + 1) / 2 - 1)
    val df = days.flatMap { case (d, c) =>
      Seq.fill(c)(("a", f"2024-01-$d%02d 01:00:00"))
    }.toDF("key", "tss").withColumn("ts", to_timestamp(col("tss")))
    val got = TheilSen.dailyTrend(df, "key", "ts")
      .as[(String, Long, Long, Long)].collect().head._4
    assert(got === want, s"got $got want $want")
  }

  test("wilson bound is monotone in evidence at a fixed rate") {
    // 9/10, 90/100, 900/1000 all have rate 900permille; the lower bound
    // must strictly increase with n — the property the ranking relies on.
    val rows = (1 to 9).map(i => ("s10", true)) ++ Seq(("s10", false)) ++
      (1 to 90).map(i => ("s100", true)) ++ (1 to 10).map(i => ("s100", false)) ++
      (1 to 900).map(i => ("s1000", true)) ++ (1 to 100).map(i => ("s1000", false))
    val out = Wilson.lowerBound(rows.toDF("g", "p"), "g", col("p"))
      .orderBy("g")
      .as[(String, Long, Long, Long, Long)].collect()
    val byG = out.map(r => r._1 -> r._5).toMap
    assert(byG("s10") < byG("s100") && byG("s100") < byG("s1000"), byG.toString)
    assert(out.forall(_._4 === 900L))
  }
}
