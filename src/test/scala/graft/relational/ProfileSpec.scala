package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("groupedRegression matches Spark's native corr/covar within float noise") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 19.0), ("a", 3L, 31.0), ("a", 4L, 39.0),
      ("b", 1L, 40.0), ("b", 2L, 30.0), ("b", 3L, 21.0), ("b", 4L, 9.0),
      ("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 6.0), ("c", 4L, 5.0)
    ).toDF("g", "x", "y")
    val got = Profile.groupedRegression(df, "g", col("x"), col("y"))
      .orderBy("g")
      .select("g", "covar_pop", "slope", "intercept", "corr", "r2")
      .as[(String, Double, Double, Double, Double, Double)].collect()
    val ref = df.groupBy("g")
      .agg(covar_pop(col("x").cast("double"), col("y")).as("cv"),
        regr_slope(col("y"), col("x").cast("double")).as("sl"),
        regr_intercept(col("y"), col("x").cast("double")).as("ic"),
        corr(col("x").cast("double"), col("y")).as("co"))
      .orderBy("g")
      .as[(String, Double, Double, Double, Double)].collect()
    got.zip(ref).foreach { case ((g, cv, sl, ic, co, r2), (g2, cv2, sl2, ic2, co2)) =>
      assert(g === g2)
      assert(math.abs(cv - cv2) < 1e-9, s"covar $g")
      assert(math.abs(sl - sl2) < 1e-9, s"slope $g")
      assert(math.abs(ic - ic2) < 1e-9, s"intercept $g")
      assert(math.abs(co - co2) < 1e-9, s"corr $g")
      assert(math.abs(r2 - co2 * co2) < 1e-9, s"r2 $g")
    }
    // perfect positive fit ~ +1, perfect negative ~ -1
    assert(got(0)._5 > 0.99 && got(1)._5 < -0.99)
  }

  test("groupedRegression is partition-order invariant (exact sums)") {
    val base = (1 to 200).map(i => ("g", i.toLong, (i * 37 % 97).toDouble))
    val a = Profile.groupedRegression(base.toDF("g", "x", "y").repartition(1),
      "g", col("x"), col("y")).select("corr").as[Double].head()
    val b = Profile.groupedRegression(
      scala.util.Random.shuffle(base).toDF("g", "x", "y").repartition(7),
      "g", col("x"), col("y")).select("corr").as[Double].head()
    assert(a === b) // bitwise equal, not approximately
  }
}
