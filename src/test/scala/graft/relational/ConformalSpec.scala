package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("tau is the floor(alpha*(n+1))-th smallest calibration score") {
    // build a frame whose md5 arms are known, then check the exact rank
    val rows = (1L to 4000L).map(i => (i, i)) // score = id (all distinct)
    val df = rows.toDF("doc_id", "s")
    val out = Conformal.splitCoverage(df, "doc_id", col("s"),
      alphaPermille = 100L, salt = "t1")
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (nCal, nTest, alpha, tau, cov) = out
    assert(nCal + nTest === 4000L && alpha === 100L)
    // recompute the reference locally with the same md5 arm
    val arms = df.select(col("doc_id"),
      Experiment.arm(col("doc_id"), "t1").as("a"))
      .as[(Long, Long)].collect().toMap
    val cal = rows.filter(r => arms(r._1) == 0L).map(_._2).sorted
    val r = (100L * (cal.length + 1)) / 1000L
    assert(tau === cal(r.toInt - 1))
    val test = rows.filter(x => arms(x._1) == 1L).map(_._2)
    assert(cov === 1000L * test.count(_ >= tau) / test.length)
    // the guarantee: empirical coverage near 900 permille
    assert(cov >= 850L && cov <= 950L, s"coverage $cov out of band")
  }

  test("too few calibration rows for the alpha refuses loudly") {
    val df = (1L to 8L).map(i => (i, i)).toDF("doc_id", "s")
    val e = intercept[IllegalArgumentException] {
      Conformal.splitCoverage(df, "doc_id", col("s"), 100L, "t2")
    }
    assert(e.getMessage.contains("calibration rows"))
  }
}
