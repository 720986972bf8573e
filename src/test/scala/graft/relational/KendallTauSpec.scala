package graft.relational

import graft.SparkSpec

class KendallTauSpec extends SparkSpec {
  import spark.implicits._

  test("perfect monotone agreement is exactly +1, reversal −1") {
    val up = (1 to 20).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    assert(Correlation.kendallTau(up, "x", "y")
      .collect().head.getDouble(3) === 1.0)
    val down = (1 to 20).map(i => (i.toLong, (21 - i).toLong)).toDF("x", "y")
    assert(Correlation.kendallTau(down, "x", "y")
      .collect().head.getDouble(3) === -1.0)
  }

  test("τ-b handles ties by the textbook correction") {
    // x=[1,1,2], y=[1,2,2]: C=1, D=0, n0=3, n1=n2=1 → τ = 1/(√2·√2),
    // which IEEE evaluates a hair under 0.5 — the exact double the
    // oracle's identical expression reproduces
    val df = Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("x", "y")
    val r = Correlation.kendallTau(df, "x", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 1L, 0L)))
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
  }

  test("misuse fails loudly: constant signal, non-integral column") {
    val const = Seq((1L, 5L), (2L, 5L)).toDF("x", "y")
    intercept[IllegalArgumentException](Correlation.kendallTau(const, "x", "y"))
    val dbl = Seq((1.0, 2.0)).toDF("x", "y")
    intercept[IllegalArgumentException](Correlation.kendallTau(dbl, "x", "y"))
  }
}
