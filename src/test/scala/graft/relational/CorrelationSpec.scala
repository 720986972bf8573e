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
}
