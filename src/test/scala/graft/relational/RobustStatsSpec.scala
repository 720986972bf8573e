package graft.relational

import graft.SparkSpec

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed median/MAD and outlier flags") {
    // group g: values 1..9 plus 1000 → med = 5.5, residuals
    // {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5} → MAD = 2.5,
    // threshold 7.5 → only 1000 flagged
    val d = ((1 to 9).map(v => ("g", v.toDouble)) :+ (("g", 1000.0)))
      .toDF("k", "v")
    val out = RobustStats.madOutliers(d, "k", "v")
      .select("n", "med", "mad", "n_outliers", "outlier_permille")
      .as[(Long, Double, Double, Long, Long)].head()
    assert(out === ((10L, 5.5, 2.5, 1L, 100L)))
  }

  test("mean-based z-score would mask what MAD catches (breakdown)") {
    // two huge outliers drag the mean/stddev so far that a 3-sigma rule
    // misses them both being "only" ~1.3 sigma away; MAD flags both
    val vals = (1 to 20).map(_.toDouble % 5) ++ Seq(1e6, 1e6)
    val d = vals.map(("g", _)).toDF("k", "v")
    val out = RobustStats.madOutliers(d, "k", "v")
      .select("n_outliers").as[Long].head()
    assert(out === 2L)
  }

  test("constant column: MAD 0 flags any deviation, none when truly constant") {
    val const = Seq(("g", 7.0), ("g", 7.0), ("g", 7.0)).toDF("k", "v")
    assert(RobustStats.madOutliers(const, "k", "v")
      .select("n_outliers").as[Long].head() === 0L)
    val nearly = Seq(("g", 7.0), ("g", 7.0), ("g", 7.0001)).toDF("k", "v")
    assert(RobustStats.madOutliers(nearly, "k", "v")
      .select("n_outliers").as[Long].head() === 1L)
  }

  test("a key-like group column fails the bounded-group guard loudly") {
    val d = (1L to 30L).map(i => (s"user_$i", i.toDouble)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      RobustStats.madOutliers(d, "k", "v", maxGroups = 8)
    }
    assert(e.getMessage.contains("category"))
  }

  test("trimmed mean drops exactly (n*trim) div 1000 rows per tail") {
    // 20 rows: 1..18 plus outliers -1000 and +1000; trim 50 permille ->
    // t = (20*50) div 1000 = 1 per tail -> keeps 1..18: mean = 9.5 ->
    // 950 cents. Raw mean = (171) * 100 div 20 = 855 cents.
    val d = ((1 to 18).map(_.toDouble) ++ Seq(-1000.0, 1000.0))
      .zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
      .toDF("k", "v", "tie")
    val out = RobustStats.trimmedMean(d, "k", "v", "tie", 50L)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(out === (("g", 20L, 1L, 18L, 950L, 855L)))
  }

  test("zero trim reduces to the raw mean") {
    val d = Seq(("g", 1.0, 1L), ("g", 2.0, 2L), ("g", 4.0, 3L))
      .toDF("k", "v", "tie")
    val out = RobustStats.trimmedMean(d, "k", "v", "tie", 0L)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    // mean = 7/3 -> 233 cents truncating
    assert(out === (("g", 3L, 0L, 3L, 233L, 233L)))
  }

  test("a trim of 500 permille or more is refused") {
    val d = Seq(("g", 1.0, 1L)).toDF("k", "v", "tie")
    intercept[IllegalArgumentException] {
      RobustStats.trimmedMean(d, "k", "v", "tie", 500L)
    }
  }
}
