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
}
