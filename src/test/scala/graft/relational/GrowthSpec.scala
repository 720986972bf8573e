package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GrowthSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built lifecycle: new/retained/resurrected/churned per day") {
    // u1 active d1,d2,d3 (new, retained, retained)
    // u2 active d1,d3    (new, resurrected on d3; churned on d2)
    // u3 active d2       (new on d2; churned on d3)
    val df = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-03"),
      (2L, "2024-01-01"), (2L, "2024-01-03"),
      (3L, "2024-01-02"))
      .toDF("u", "d").select(col("u"), col("d").cast("timestamp").as("ts"))
    val got = Growth.dailyAccounting(df, "u", "ts")
      .select("day", "n_active", "n_new", "n_retained", "n_resurrected",
        "n_churned", "quick_x_permille")
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1.toString)
    assert(got.map(r => (r._1.toString, r._2, r._3, r._4, r._5, r._6)).toSeq
      === Seq(
        ("2024-01-01", 2L, 2L, 0L, 0L, 0L),
        ("2024-01-02", 2L, 1L, 1L, 0L, 1L),   // u2 churned on d2
        ("2024-01-03", 2L, 0L, 1L, 1L, 1L))) // u3 churned on d3
    assert(got.head._7 === -1L)               // churn-free day flagged
    assert(got(1)._7 === 1000L)               // 1 new / 1 churned
  }

  test("a zero-active day still emits its churn row (full-outer, not left)") {
    // u1 active d1 only; u2 active d1 and d3 — on d2 EVERYBODY is silent:
    // no byDay row exists, yet both users churned into d2. A left join
    // would drop the day and break Δactives = new + resurrected − churned
    // across the gap.
    val df = Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (2L, "2024-01-03"))
      .toDF("u", "d").select(col("u"), col("d").cast("timestamp").as("ts"))
    val got = Growth.dailyAccounting(df, "u", "ts")
      .select("day", "n_active", "n_new", "n_retained", "n_resurrected",
        "n_churned", "quick_x_permille")
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1.toString)
    assert(got.map(r => (r._1.toString, r._2, r._3, r._4, r._5, r._6, r._7))
      .toSeq === Seq(
        ("2024-01-01", 2L, 2L, 0L, 0L, 0L, -1L),
        ("2024-01-02", 0L, 0L, 0L, 0L, 2L, 0L),   // the gap day survives
        ("2024-01-03", 1L, 0L, 0L, 1L, 0L, -1L)))
    // and the delta identity holds ACROSS the gap
    got.sliding(2).foreach {
      case Array(p, c) =>
        assert(c._2 - p._2 === c._3 + c._5 - c._6)
      case _ =>
    }
  }

  test("fixture: the accounting identities hold every day") {
    val rows = Growth.dailyAccounting(events(), "user_id", "ts")
      .orderBy(col("day"))
      .select("n_active", "n_new", "n_retained", "n_resurrected", "n_churned")
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (act, nw, ret, res, _) =>
      assert(act === nw + ret + res, "actives must decompose exactly")
    }
    rows.sliding(2).foreach {
      case Array((prevAct, _, _, _, _), (act, nw, _, res, ch)) =>
        assert(act - prevAct === nw + res - ch,
          "day-over-day delta must equal new + resurrected - churned")
      case _ =>
    }
  }

  private def events() = graft.queries.Dsl.events(spark, sf0001)
}
