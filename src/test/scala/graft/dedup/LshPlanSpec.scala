package graft.dedup

import graft.SparkSpec

class LshPlanSpec extends SparkSpec {

  private lazy val curve = LshPlan.sCurve(spark)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getLong(4))).toSeq

  test("probabilities stay in range and rise monotonically in s") {
    assert(curve.forall { case (_, _, _, p, pm) =>
      p >= 0.0 && p <= 1.0 && pm >= 0L && pm <= 1000L })
    curve.groupBy(c => (c._1, c._2)).foreach { case (_, rows) =>
      val ps = rows.sortBy(_._3).map(_._4)
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    }
  }

  test("more bands at the same budget dominate everywhere on the grid") {
    val b16 = curve.filter(_._1 == 16L).map(c => c._3 -> c._4).toMap
    val b2 = curve.filter(_._1 == 2L).map(c => c._3 -> c._4).toMap
    assert(b16.keySet === b2.keySet)
    assert(b16.forall { case (s, p) => p >= b2(s) })
  }

  test("the curve steepens with rows per band: r=8 is the sharpest filter") {
    // at jaccard 300‰ the r=8 config admits almost nothing while r=1 fires
    val at300 = curve.filter(_._3 == 300L).map(c => c._2 -> c._5).toMap
    assert(at300(1L) > 900L && at300(8L) < 10L)
  }

  test("misuse fails loudly: bad step, oversized chain") {
    intercept[IllegalArgumentException](LshPlan.sCurve(spark, stepPermille = 5))
    intercept[IllegalArgumentException](
      LshPlan.sCurve(spark, configs = Seq((128, 1))))
  }
}
