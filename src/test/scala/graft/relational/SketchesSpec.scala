package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sf0001/orders.parquet")
  private lazy val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")

  test("count-min: est >= exact always, exact when width has no collisions") {
    val df = Seq.tabulate(300)(i => i % 7L).toDF("k") // 7 keys, skewed-free
    val sk = Sketches.countMinSketch(df, "k", depth = 4, width = 64)
    // sketch is bounded by depth*width cells, total mass = depth * rows
    assert(sk.count() <= 4 * 64)
    assert(sk.agg(sum("cnt")).as[Long].head() === 4 * 300)
    val est = Sketches.countMinEstimate(sk, df.distinct(), "k", depth = 4, width = 64)
      .as[(Long, Long)].collect().toMap
    // 7 keys across 4 independent 64-wide rows: min-of-rows is exact w.h.p.,
    // and the one-sided guarantee must hold regardless
    (0L until 7L).foreach { k => assert(est(k) >= 300 / 7) }
    assert(est.values.sum >= 300)
  }

  test("count-min estimates keys absent from the build as 0 via empty cells") {
    val df = Seq(1L, 2L, 3L).toDF("k")
    val sk = Sketches.countMinSketch(df, "k", depth = 4, width = 1024)
    // wide sketch: an absent key almost surely hits at least one empty cell
    val est = Sketches.countMinEstimate(sk, Seq(999L, 1L).toDF("k"), "k",
      depth = 4, width = 1024).as[(Long, Long)].collect().toMap
    assert(est(999L) === 0L, "absent key must estimate 0, not vanish or overshoot")
    assert(est(1L) === 1L)
  }

  test("count-min under forced collisions keeps one-sided error") {
    val df = Seq.tabulate(500)(i => i.toLong % 100L).toDF("k") // 100 keys, width 16
    val sk = Sketches.countMinSketch(df, "k", depth = 3, width = 16)
    val est = Sketches.countMinEstimate(sk, df.distinct(), "k", depth = 3, width = 16)
      .as[(Long, Long)].collect().toMap
    (0L until 100L).foreach { k => assert(est(k) >= 5, s"key $k underestimated") }
  }

  test("bloom: no false negatives, measured FP rate within theory, real pruning") {
    val hi = orders.filter(col("o_totalprice") > 450000)
    val keys = hi.select("o_orderkey").as[Long].collect().toSet
    val words = Sketches.bloomBuild(hi, "o_orderkey", k = 5, mBits = 16384)
    assert(words.size === 256)

    val probed = orders
      .select(col("o_orderkey"),
        Sketches.bloomMightContain(words, col("o_orderkey"), k = 5).as("hit"))
      .as[(Long, Boolean)].collect()
    // every build key passes (no false negatives — correctness of the prune)
    probed.filter(p => keys.contains(p._1)).foreach(p => assert(p._2, s"FN ${p._1}"))
    // false-positive rate near (1 - e^{-kn/m})^k, generously bounded
    val neg = probed.filterNot(p => keys.contains(p._1))
    val fpRate = neg.count(_._2).toDouble / neg.length
    val p = 1.0 - math.exp(-5.0 * keys.size / 16384.0)
    assert(fpRate <= 5 * math.pow(p, 5) + 0.01, f"fp=$fpRate%.4f theory=${math.pow(p, 5)}%.4f")

    // the probe-side prune actually removes the bulk of lineitem
    val kept = lineitem
      .filter(Sketches.bloomMightContain(words, col("l_orderkey"), k = 5)).count()
    val total = lineitem.count()
    assert(kept < total / 2, s"pruned only ${total - kept} of $total")
    // and never drops a true match
    val joined = lineitem.join(hi.select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey")).count()
    val joinedPruned = lineitem
      .filter(Sketches.bloomMightContain(words, col("l_orderkey"), k = 5))
      .join(hi.select("o_orderkey"), col("l_orderkey") === col("o_orderkey")).count()
    assert(joined === joinedPruned)
  }
}
