package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  private def eventsFor(counts: Seq[(String, Int, Int)]) =
    counts.flatMap { case (k, d, n) =>
      Seq.fill(n)((k, f"2024-01-$d%02d 12:00:00"))
    }.toDF("key", "tss").withColumn("ts", to_timestamp(col("tss")))

  test("a perfectly linear series yields its exact slope") {
    val df = eventsFor(Seq(("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("a", 4, 4)))
    val out = TheilSen.dailyTrend(df, "key", "ts")
      .as[(String, Long, Long, Long)].collect().head
    assert(out === (("a", 4L, 6L, 1000000L)))
  }

  test("one spike day cannot bend the median slope (the point of Theil-Sen)") {
    // y = 1,2,3,100,5,6: only 5 of 15 pairs touch the spike; the lower
    // median (rank 8) still sits on the clean slope 1e6. OLS over the
    // same series reports ~8.3e6.
    val df = eventsFor(Seq(("a", 1, 1), ("a", 2, 2), ("a", 3, 3),
      ("a", 4, 100), ("a", 5, 5), ("a", 6, 6)))
    val out = TheilSen.dailyTrend(df, "key", "ts")
      .as[(String, Long, Long, Long)].collect().head
    assert(out === (("a", 6L, 15L, 1000000L)))
  }

  test("even pair counts take the lower median at a defined rank") {
    // y = 1,1,1,11 → slopes (0,0,0, 3333333, 5000000, 10000000),
    // m = 6, rank (6+1) div 2 = 3 → 0.
    val df = eventsFor(Seq(("a", 1, 1), ("a", 2, 1), ("a", 3, 1),
      ("a", 4, 11)))
    val out = TheilSen.dailyTrend(df, "key", "ts")
      .as[(String, Long, Long, Long)].collect().head
    assert(out === (("a", 4L, 6L, 0L)))
  }
}
