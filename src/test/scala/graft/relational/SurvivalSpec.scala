package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  /** Entities as (id, firstDay, lastDay) on a January 2024 calendar;
    * dataset max is the max lastDay. */
  private def lives(rows: Seq[(Long, Int, Int)]) =
    rows.flatMap { case (id, a, b) =>
      Seq((id, f"2024-01-$a%02d 00:00:00"), (id, f"2024-01-$b%02d 00:00:00"))
    }.toDF("id", "tss").withColumn("ts", to_timestamp(col("tss")))

  private def km(df: org.apache.spark.sql.DataFrame, horizon: Int,
                 cap: Int = 4096) =
    Survival.retention(spark, df, "id", "ts", horizonDays = horizon,
      maxDays = cap)
      .orderBy("day").as[(Long, Long, Long, Long)].collect()

  test("the product-limit recurrence folds in day order with truncation") {
    // Lifetimes: 2, 2, 5, 9 days; max ts = Jan 10; horizon 0 → all deaths.
    // day 2: n=4 d=2 → s = 1000·2/4 = 500
    // day 5: n=2 d=1 → s = 500·1/2  = 250
    // day 9: n=1 d=1 → s = 0
    val out = km(lives(Seq((1L, 1, 3), (2L, 1, 3), (3L, 1, 6), (4L, 1, 10))),
      horizon = 0)
    assert(out === Array((2L, 4L, 2L, 500L), (5L, 2L, 1L, 250L),
      (9L, 1L, 1L, 0L)))
  }

  test("a censored entity leaves the risk set without dying") {
    // Max ts Jan 20, horizon 5: e3 (last Jan 19) and e4 (Jan 20) are
    // censored; e1 (life 2) and e2 (life 9) die. e4's lifetime is 0, so
    // it exits the risk set before day 2; e3 holds it through day 9 and
    // emits no row of its own.
    // day 2: n=3 d=1 → s = 666; day 9: n=2 d=1 → s = 333.
    val out = km(lives(Seq((1L, 1, 3), (2L, 1, 10), (3L, 2, 19),
      (4L, 20, 20))), horizon = 5)
    assert(out === Array((2L, 3L, 1L, 666L), (9L, 2L, 1L, 333L)))
  }

  test("truncating division matches the documented recurrence, not rounding") {
    // 3 entities, deaths on distinct days: s = 1000·2/3 = 666 (not 667).
    val out = km(lives(Seq((1L, 1, 2), (2L, 1, 5), (3L, 1, 8))), horizon = 0)
    assert(out === Array((1L, 3L, 1L, 666L), (4L, 2L, 1L, 333L),
      (7L, 1L, 1L, 0L)))
  }

  test("a day table past the cap is refused loudly") {
    val e = intercept[IllegalArgumentException] {
      km(lives(Seq((1L, 1, 3), (2L, 1, 6), (3L, 1, 9))), horizon = 0,
        cap = 2)
    }
    assert(e.getMessage.contains("day table exceeds"))
  }
}
