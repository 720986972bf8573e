package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized recentCount equals the naive non-equi join") {
    val left = graft.queries.Dsl.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = graft.queries.Dsl.events(spark, sf0001)
      .filter(col("event_type") === "click")
    val w = 600000000L // 10 min in micros

    val got = IntervalJoin.recentCount(left, "event_id", "user_id", "ts",
      right, "ts", w, "n_clicks")
      .select("event_id", "n_clicks").as[(Long, Long)].collect().toMap

    val naive = left.as("p").join(right.as("c"),
        col("c.user_id") === col("p.user_id") &&
          unix_micros(col("c.ts")) >= unix_micros(col("p.ts")) - w &&
          unix_micros(col("c.ts")) < unix_micros(col("p.ts")), "left")
      .groupBy(col("p.event_id"))
      .agg(count(col("c.event_id")).as("n_clicks"))
      .as[(Long, Long)].collect().toMap

    assert(got === naive)
    assert(got.size === left.count())
    assert(got.values.exists(_ > 0), "some purchase should have recent clicks")
    assert(got.values.exists(_ == 0), "some purchase should have none")
  }

  test("boundary semantics: [t-w, t) — inclusive low, exclusive high") {
    val left = Seq((1L, 100L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, java.sql.Timestamp.valueOf("2024-01-01 09:50:00")), // exactly t-w: in
      (100L, java.sql.Timestamp.valueOf("2024-01-01 09:49:59")), // older: out
      (100L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), // exactly t: out
      (100L, java.sql.Timestamp.valueOf("2024-01-01 09:55:00")), // inside: in
      (999L, java.sql.Timestamp.valueOf("2024-01-01 09:55:00"))  // other key: out
    ).toDF("user_id", "ts")
    val got = IntervalJoin.recentCount(left, "event_id", "user_id", "ts",
      right, "ts", 600000000L, "n")
      .select("n").as[Long].collect().toSeq
    assert(got === Seq(2L))
  }

  test("firstInWindow picks the earliest in-window row, id tiebreak, null when none") {
    val left = Seq(
      (1L, 100L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 200L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (11L, 100L, java.sql.Timestamp.valueOf("2024-01-01 09:50:00")), // exactly t-w: in, earliest
      (12L, 100L, java.sql.Timestamp.valueOf("2024-01-01 09:55:00")), // later: not first
      (10L, 100L, java.sql.Timestamp.valueOf("2024-01-01 09:49:59")), // older: out
      (13L, 100L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), // exactly t: out
      (14L, 999L, java.sql.Timestamp.valueOf("2024-01-01 09:55:00"))  // other key: out
    ).toDF("click_id", "user_id", "ts")
    val got = IntervalJoin.firstInWindow(left, "event_id", "user_id", "ts",
      right, "click_id", "ts", 600000000L, "f_ts", "f_id")
      .select("event_id", "f_id").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(11L), 2L -> None))

    // tie on ts: the smaller right id wins deterministically
    val tied = Seq(
      (21L, 100L, java.sql.Timestamp.valueOf("2024-01-01 09:55:00")),
      (20L, 100L, java.sql.Timestamp.valueOf("2024-01-01 09:55:00")))
      .toDF("click_id", "user_id", "ts")
    val tieGot = IntervalJoin.firstInWindow(left, "event_id", "user_id", "ts",
      tied, "click_id", "ts", 600000000L, "f_ts", "f_id")
      .select("event_id", "f_id").as[(Long, Option[Long])].collect().toMap
    assert(tieGot(1L) === Some(20L))
  }

  test("firstInWindow agrees with the naive argmin join on fixture data") {
    val ev = graft.queries.Dsl.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
    val w = 7200000000L
    val got = IntervalJoin.firstInWindow(purchases, "event_id", "user_id", "ts",
      clicks, "event_id", "ts", w, "f_ts", "f_id")
      .filter(col("f_id").isNotNull)
      .select("event_id", "f_id").as[(Long, Long)].collect().toMap
    val naive = purchases.as("p").join(clicks.as("c"),
        col("c.user_id") === col("p.user_id") &&
          unix_micros(col("c.ts")) >= unix_micros(col("p.ts")) - w &&
          unix_micros(col("c.ts")) < unix_micros(col("p.ts")))
      .groupBy(col("p.event_id"))
      .agg(min(struct(unix_micros(col("c.ts")), col("c.event_id"))).as("m"))
      .select(col("event_id"), col("m").getField("event_id"))
      .as[(Long, Long)].collect().toMap
    assert(got === naive)
    assert(got.nonEmpty)
  }
}
