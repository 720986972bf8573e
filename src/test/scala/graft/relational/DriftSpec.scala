package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("half-vs-half permille shares and delta (hand-computed)") {
    // range [0, 100s] → mid = 50s; a: 3 first / 1 second, b: 1 / 3
    val d = Seq(
      ("a", ts(0)), ("a", ts(10)), ("a", ts(20)), ("b", ts(30)),
      ("a", ts(60)), ("b", ts(70)), ("b", ts(80)), ("b", ts(100)))
      .toDF("cat", "ts")
    val out = Drift.tvByCategory(d, "cat", "ts")
      .select("category", "n_first", "n_second", "p1_permille", "p2_permille",
        "delta_permille")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      ("a", 3L, 1L, 750L, 250L, 500L),
      ("b", 1L, 3L, 250L, 750L, 500L)))
  }

  test("row exactly at the midpoint falls in the second half") {
    val d = Seq(("x", ts(0)), ("x", ts(50)), ("x", ts(100))).toDF("cat", "ts")
    val out = Drift.tvByCategory(d, "cat", "ts")
      .select("n_first", "n_second").as[(Long, Long)].head()
    assert(out === ((1L, 2L)))
  }

  test("constant timestamp: empty first half reports 0 shares, not DIVIDE_BY_ZERO") {
    // min ts == max ts → midpoint equals every row's ts → all rows fall in
    // the SECOND half, __t1 = 0; the guarded division reports p1 = 0
    val d = Seq(("a", ts(42)), ("b", ts(42)), ("a", ts(42))).toDF("cat", "ts")
    val out = Drift.tvByCategory(d, "cat", "ts")
      .select("category", "n_first", "n_second", "p1_permille", "p2_permille")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(("a", 0L, 2L, 0L, 666L), ("b", 0L, 1L, 0L, 333L)))
  }

  test("stable mix yields zero delta") {
    val d = Seq(
      ("a", ts(0)), ("b", ts(10)), ("a", ts(60)), ("b", ts(70)))
      .toDF("cat", "ts")
    val out = Drift.tvByCategory(d, "cat", "ts")
      .select("delta_permille").as[Long].collect()
    assert(out.forall(_ === 0L))
  }
}
