package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("a constant column has a zero-width band at the exact mean") {
    // every replicate mean of a constant 2.00 is exactly 2.00·10⁶ micro
    val df = (1 to 40).map(i => ("a", i.toString, 2.00)).toDF("g", "id", "v")
    val out = Bootstrap.meanCi(df, "g", "id", col("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 40L, 2000000L, 2000000L, 2000000L, 0L)))
  }

  test("bands are deterministic and ordered lo ≤ mean-neighborhood ≤ hi") {
    val df = (1 to 60).map(i => ("a", i.toString, i.toDouble)).toDF("g", "id", "v")
    val a = Bootstrap.meanCi(df, "g", "id", col("v")).collect().toSeq
    val b = Bootstrap.meanCi(df, "g", "id", col("v")).collect().toSeq
    assert(a === b)
    val r = a.head
    val (lo, hi) = (r.getLong(3), r.getLong(4))
    assert(lo <= hi && r.getLong(5) === hi - lo)
    // the band brackets the full-sample mean on symmetric-ish data
    assert(lo <= r.getLong(2) && r.getLong(2) <= hi)
  }

  test("misuse fails loudly: replicate bounds, zero-weight tiny group") {
    val df = Seq(("a", "1", 2.00)).toDF("g", "id", "v")
    intercept[IllegalArgumentException](
      Bootstrap.meanCi(df, "g", "id", col("v"), replicates = 4))
    // a 1-row group draws w = 0 on some of the 32 replicates → loud
    intercept[IllegalArgumentException](
      Bootstrap.meanCi(df, "g", "id", col("v")))
  }
}
