package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WilsonSpec extends SparkSpec {
  import spark.implicits._

  private def expected(n: Long, k: Long): Long = {
    val (nd, kd) = (n.toDouble, k.toDouble)
    math.floor(1e6 *
      ((kd + 2.0 - 2.0 * math.sqrt(kd * (nd - kd) / nd + 1.0)) /
        (nd + 4.0))).toLong
  }

  test("thin perfect evidence ranks below a well-measured 96%") {
    // The raw rate says 3/3 (1000‰) beats 96/100 (960‰); the z=2 lower
    // bound says the opposite — 3/7 ≈ 428571µ vs ≈ 900000µ.
    val rows = (1 to 3).map(i => ("tiny", true)) ++
      (1 to 96).map(i => ("big", true)) ++ (1 to 4).map(i => ("big", false))
    val out = Wilson.lowerBound(rows.toDF("g", "p"), "g", col("p"))
      .orderBy(desc("wilson_lower_micro"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("big", 100L, 96L, 960L, expected(100L, 96L)),
      ("tiny", 3L, 3L, 1000L, expected(3L, 3L))))
    assert(expected(3L, 3L) === 428571L)
  }

  test("all-pass and all-fail endpoints, and NULLs count as failures") {
    val rows = Seq(("a", Some(true)), ("a", Some(true)),
      ("b", Some(false)), ("b", None)).toDF("g", "p")
    val out = Wilson.lowerBound(rows, "g", col("p"))
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 2L, 2L, 1000L, expected(2L, 2L)),
      ("b", 2L, 0L, 0L, 0L)))
  }
}
