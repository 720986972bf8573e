package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  // user 1 converts through view→click; user 2 views and drops; user 3
  // converts directly (no touches)
  private lazy val ev = Seq(
    (1L, "view", "2024-01-01 10:00:00", 1L),
    (1L, "click", "2024-01-01 10:05:00", 2L),
    (1L, "purchase", "2024-01-01 10:10:00", 3L),
    (2L, "view", "2024-01-01 11:00:00", 4L),
    (3L, "purchase", "2024-01-01 12:00:00", 5L))
    .toDF("user_id", "event_type", "tss", "event_id")
    .withColumn("ts", to_timestamp(col("tss")))

  private val chans = Seq("view", "click", "signup")

  test("journeys become the expected exact transition counts") {
    val t = MarkovAttribution.transitions(
      ev, "user_id", "event_type", "ts", "event_id", chans, "purchase")
      .as[(String, String, Long)].collect().toSet
    assert(t === Set(
      ("(start)", "view", 2L), ("view", "click", 1L),
      ("click", "(conv)", 1L), ("view", "(null)", 1L),
      ("(start)", "(conv)", 1L)))
  }

  test("removal effects match the hand-computed absorption chain") {
    // base: p(click)=10⁶, p(view)=(10⁶+0) div 2=500000,
    // p(start)=(2·500000+10⁶) div 3=666666; removing view or click each
    // cut the only touch path → 333333; signup never appears → 0
    val t = MarkovAttribution.transitions(
      ev, "user_id", "event_type", "ts", "event_id", chans, "purchase")
    val out = MarkovAttribution.attribution(t, chans, rounds = 12)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      ("click", 666666L, 333333L, 333333L, Some(500L)),
      ("signup", 666666L, 666666L, 0L, Some(0L)),
      ("view", 666666L, 333333L, 333333L, Some(500L))))
  }

  test("misuse fails loudly: conv type in channels, empty transitions") {
    intercept[IllegalArgumentException](MarkovAttribution.transitions(
      ev, "user_id", "event_type", "ts", "event_id",
      Seq("view", "purchase"), "purchase"))
    val empty = Seq.empty[(String, String, Long)].toDF("src", "dst", "cnt")
    intercept[IllegalArgumentException](
      MarkovAttribution.attribution(empty, chans))
  }
}
