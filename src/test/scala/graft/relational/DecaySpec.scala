package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecaySpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, String, Double)]) =
    rows.toDF("user", "tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))

  test("one bit per half-life: 1000 → 500 → 250 cents") {
    val d = df(Seq((1L, "2024-01-15 10:00:00", 10.0),
      (1L, "2024-01-08 10:00:00", 10.0),
      (1L, "2024-01-01 10:00:00", 10.0)))
    val out = Decay.halfLifeScores(d, "user", "ts", "value", 7)
      .as[(Long, Long, Long, Long)].collect().head
    assert(out === ((1L, 3L, 3000L, 1750L)))
  }

  test("truncating division, and ages inside one half-life do not decay") {
    // 0.05 at age 8 days → 5 div 2 = 2; 0.05 at age 6 days → 5 (k = 0).
    val d = df(Seq((1L, "2024-01-09 10:00:00", 0.05),
      (2L, "2024-01-01 10:00:00", 0.05),
      (3L, "2024-01-03 10:00:00", 0.05)))
    val out = Decay.halfLifeScores(d, "user", "ts", "value", 7)
      .orderBy("user").select("user", "decayed_cents")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 5L), (2L, 2L), (3L, 5L)))
  }

  test("the shift clamp zeroes ancient activity instead of resurrecting it") {
    // age 3500 days → k would be 500; Java's raw shift would wrap to
    // 500 mod 64 = 52 and leak value back in. The clamp at 62 makes the
    // contribution exactly 0.
    val d = df(Seq((1L, "2024-01-01 10:00:00", 100.0),
      (1L, "2014-06-01 10:00:00", 100.0)))
    val out = Decay.halfLifeScores(d, "user", "ts", "value", 7)
      .as[(Long, Long, Long, Long)].collect().head
    assert(out === ((1L, 2L, 20000L, 10000L)))
  }
}
