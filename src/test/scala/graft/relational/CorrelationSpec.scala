package graft.relational

import graft.SparkSpec

class CorrelationSpec extends SparkSpec {
  import spark.implicits._

  test("perfect monotone agreement gives rho = 1, reversal gives -1") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("x", "y")
    val r1 = Correlation.spearman(up, "x", "y")
      .as[(Long, Double)].collect().head
    assert(r1._1 === 4L && math.abs(r1._2 - 1.0) < 1e-12)
    val down = Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L)).toDF("x", "y")
    val r2 = Correlation.spearman(down, "x", "y")
      .as[(Long, Double)].collect().head
    assert(r2._1 === 4L && math.abs(r2._2 + 1.0) < 1e-12)
  }

  test("ties take average ranks: doubled-rank arithmetic stays exact") {
    // x = (1,1,2), y = (5,5,9): both columns tie their first two rows the
    // same way, so rank agreement is perfect despite the ties.
    // Doubled ranks: x → (3,3,7) (avg rank 1.5 doubled, then 3.5 doubled);
    // identical for y. rho = 1 exactly.
    val df = Seq((1L, 5L), (1L, 5L), (2L, 9L)).toDF("x", "y")
    val r = Correlation.spearman(df, "x", "y")
      .as[(Long, Double)].collect().head
    // sqrt(dx)*sqrt(dy) is one ulp off dx when dx == dy — the oracle gate
    // is the exact-parity check; here we assert the math to 1e-12
    assert(r._1 === 3L && math.abs(r._2 - 1.0) < 1e-12)
  }

  test("independent-looking permutation lands between -1 and 1") {
    // x ascending, y a fixed permutation with rank pairs (1,2),(2,4),
    // (3,1),(4,3): d = (-1,-2,2,1), Σd² = 10, rho = 1 - 6·10/(4·15) = 0.
    val df = Seq((1L, 20L), (2L, 40L), (3L, 10L), (4L, 30L)).toDF("x", "y")
    val r = Correlation.spearman(df, "x", "y")
      .as[(Long, Double)].collect().head
    assert(r._1 === 4L && math.abs(r._2) < 1e-12)
  }

  test("NULLs, constant columns, and unbounded domains fail loudly") {
    val withNull = Seq((Some(1L), 1L), (None, 2L), (Some(3L), 3L))
      .toDF("x", "y")
    val e1 = intercept[IllegalArgumentException] {
      Correlation.spearman(withNull, "x", "y")
    }
    assert(e1.getMessage.contains("NULL"))
    val const = Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("x", "y")
    val e2 = intercept[IllegalArgumentException] {
      Correlation.spearman(const, "x", "y")
    }
    assert(e2.getMessage.contains("constant"))
    val wide = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val e3 = intercept[IllegalArgumentException] {
      Correlation.spearman(wide, "x", "y", maxDistinct = 2)
    }
    assert(e3.getMessage.contains("distinct"))
  }

  test("pearson matrix: one scan, exact r2 per pair, constant column flagged not fatal") {
    import org.apache.spark.sql.functions.col
    // y = 2x (r = 1), z anti-correlated with x (r < 0), w constant
    val rows = (1L to 40L).map(i => (i, 2L * i, 100L - i + (i % 3), 7L))
    val df = rows.toDF("x", "y", "z", "w")
    val out = Correlation.pearsonMatrix(df, Seq(
      "x" -> col("x"), "y" -> col("y"), "z" -> col("z"), "w" -> col("w")))
      .as[(String, String, Long, Option[Long], Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out.size === 6)
    // exact replay of the fixed-order truncated r2 for (x, y)
    def sums(f: ((Long, Long, Long, Long)) => Long,
             g: ((Long, Long, Long, Long)) => Long) = {
      val n = BigInt(rows.size)
      val sx = rows.map(f).map(BigInt(_)).sum
      val sy = rows.map(g).map(BigInt(_)).sum
      val sxx = rows.map(r => BigInt(f(r)) * f(r)).sum
      val syy = rows.map(r => BigInt(g(r)) * g(r)).sum
      val sxy = rows.map(r => BigInt(f(r)) * g(r)).sum
      val a = n * sxy - sx * sy
      val b = n * sxx - sx * sx
      val c = n * syy - sy * sy
      ((BigInt(1000) * a / b * a / c).toLong, a.signum.toLong)
    }
    val (r2xy, sgnXy) = sums(_._1, _._2)
    assert(out(("x", "y")) === ((40L, Some(r2xy), sgnXy)))
    assert(r2xy === 1000L && sgnXy === 1L, "y = 2x must read r2 = 1000, sign +")
    val (r2xz, sgnXz) = sums(_._1, _._3)
    assert(out(("x", "z")) === ((40L, Some(r2xz), sgnXz)))
    assert(sgnXz === -1L, "z decreases in x")
    // every pair against the constant column is NULL r2 with sign 0
    Seq(("x", "w"), ("y", "w"), ("z", "w")).foreach { p =>
      assert(out(p) === ((40L, None, 0L)), s"pair $p must flag the constant")
    }
  }

  test("pearson matrix refuses duplicate names and silly arity") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Correlation.pearsonMatrix(df, Seq("x" -> col("x")))
    }
    intercept[IllegalArgumentException] {
      Correlation.pearsonMatrix(df, Seq("x" -> col("x"), "x" -> col("y")))
    }
  }
}
