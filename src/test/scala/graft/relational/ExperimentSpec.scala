package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("assignment is deterministic, salt-sensitive, and roughly balanced") {
    val users = (1L to 400L).map(u => Tuple1(u)).toDF("u")
    val a1 = users.select(col("u"), Experiment.arm(col("u"), "s1").as("arm"))
      .as[(Long, Long)].collect().toMap
    val a2 = users.select(col("u"), Experiment.arm(col("u"), "s1").as("arm"))
      .as[(Long, Long)].collect().toMap
    assert(a1 === a2, "same salt must reassign identically")
    val b = users.select(col("u"), Experiment.arm(col("u"), "s2").as("arm"))
      .as[(Long, Long)].collect().toMap
    assert(a1.keys.count(u => a1(u) != b(u)) > 100,
      "a different salt must reshuffle a substantial share")
    val n0 = a1.values.count(_ == 0L)
    assert(n0 > 140 && n0 < 260, s"50/50 split out of balance: $n0/400")
  }

  test("SRM flag fires exactly at the frozen critical value") {
    // craft arms by picking users whose arm is known, sizes 100 vs 60:
    // chi2 = (40²/160)·1e6 = 10,000,000 micro > 3,841,459 → flag
    val users = (1L to 100000L).map(u => Tuple1(u)).toDF("u")
      .select(col("u"), Experiment.arm(col("u"), "x").as("arm"))
      .as[(Long, Long)].collect()
    val picked = users.filter(_._2 == 0L).take(100) ++
      users.filter(_._2 == 1L).take(60)
    val ev = picked.map { case (u, _) => (u, "view") }.toSeq
      .toDF("user_id", "event_type")
    val row = Experiment.srmConversionCheck(ev, "user_id",
      col("event_type") === "purchase", "x")
      .select("n_a", "n_b", "srm_chi2_micro", "srm_flag")
      .as[(Long, Long, Long, Boolean)].collect().head
    assert((row._1, row._2) === ((100L, 60L)))
    assert(row._3 === 1000000L * 40 * 40 / 160)
    assert(row._4)
  }

  test("balanced A/A on the fixture: no SRM flag, conversions within noise") {
    val ev = graft.queries.Dsl.events(spark, sf0001)
    val row = Experiment.srmConversionCheck(ev, "user_id",
      col("event_type") === "purchase", "exp1")
      .select("srm_flag").as[Boolean].collect().head
    assert(!row, "md5 assignment must not trip SRM on null data")
  }
}
