package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked digit mix, deviations, and L1") {
    // digits 1,1,1,2,2,3,4,5,9 over 9 rows: obs permille 333/222/111...,
    // L1 = 32+46+14+14+32+67+58+51+65 = 379 (missing 6,7,8 pay full
    // expected share).
    val vals = Seq(10L, 150L, 1999L, 2L, 25L, 30L, 4L, 55L, 9L).toDF("v")
    val out = Benford.firstDigitAudit(vals, col("v"))
      .orderBy("digit")
      .select("digit", "n", "obs_permille", "dev_permille", "l1_permille")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) === Seq(
      (1L, 3L, 333L), (2L, 2L, 222L), (3L, 1L, 111L), (4L, 1L, 111L),
      (5L, 1L, 111L), (6L, 0L, 0L), (7L, 0L, 0L), (8L, 0L, 0L),
      (9L, 1L, 111L)))
    assert(out.forall(_._5 === 379L))
    assert(out.find(_._1 == 6L).get._4 === -67L)
  }

  test("zero, negative, and NULL values are excluded from the audit") {
    val vals = Seq(Some(100L), Some(0L), Some(-5L), None, Some(200L))
      .toDF("v")
    val out = Benford.firstDigitAudit(vals, col("v"))
      .agg(sum("n")).as[Long].collect().head
    assert(out === 2L)
  }
}
