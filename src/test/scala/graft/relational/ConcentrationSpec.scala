package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConcentrationSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked Gini and top-decile share") {
    // weights (1,1,1,1,6): doubled ranks 5 (×4) and 10; Σr2w = 80,
    // G = (80 − 6·10)/(5·10) = 0.4 exactly; top ⌈5/10⌉ = 1 doc owns 600‰.
    val df = Seq(1L, 1L, 1L, 1L, 6L).toDF("w")
    val out = Concentration.gini(df, col("w"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(out === ((5L, 10L, 400000L, 600L)))
  }

  test("equal weights give exactly zero concentration") {
    val df = Seq.fill(10)(5L).toDF("w")
    val out = Concentration.gini(df, col("w"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(out === ((10L, 50L, 0L, 100L)))
  }

  test("a decile boundary inside a tie class splits it arithmetically") {
    // weights (3,3,3,3,3,3,3,3,3,1), n=10 → k=1: the top class has 9
    // members but only ONE row's worth counts: 3 of 28 → 107‰.
    val df = (Seq.fill(9)(3L) :+ 1L).toDF("w")
    val out = Concentration.gini(df, col("w"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(out._4 === 107L)
  }

  test("misuse fails loudly") {
    intercept[IllegalArgumentException] {
      Concentration.gini(Seq(Some(1L), None).toDF("w"), col("w"))
    }
    intercept[IllegalArgumentException] {
      Concentration.gini(Seq(-1L, 2L).toDF("w"), col("w"))
    }
    intercept[IllegalArgumentException] {
      Concentration.gini(Seq(0L, 0L).toDF("w"), col("w"))
    }
    intercept[IllegalArgumentException] {
      Concentration.gini(Seq(1L, 2L, 3L).toDF("w"), col("w"), maxDistinct = 2)
    }
  }
}
