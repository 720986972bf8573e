package graft.relational

import graft.SparkSpec

class RateAuditSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("peak is the max trailing-window count, inclusive bounds") {
    // user 1: events at 0,10,50,59,120 → window (t-59, t]: at t=59 the
    // first four are inside (0 ≥ 59-59) → peak 4; the 120 event sees only
    // itself... no: 120-59=61 → only 120 → 1
    val d = Seq(0L, 10L, 50L, 59L, 120L).map(s => (1L, ts(s)))
      .toDF("user_id", "ts")
    val out = RateAudit.peakRates(d, "user_id", "ts", 60L, 5L)
      .select("n_events", "peak_in_window", "limited")
      .as[(Long, Long, Boolean)].head()
    assert(out === ((5L, 4L, false)))
  }

  test("burst over the limit flags; steady rate does not") {
    val burst = (0L until 10L).map(s => (1L, ts(s)))        // 10 in 10s
    val steady = (0L until 10L).map(i => (2L, ts(i * 100))) // 1 per 100s
    val out = RateAudit.peakRates((burst ++ steady).toDF("user_id", "ts"),
      "user_id", "ts", 60L, 5L)
      .select("user_id", "peak_in_window", "limited")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((10L, true)))
    assert(out(2L) === ((1L, false)))
  }

  test("duplicate timestamps are peers: all counted in each other's window") {
    val d = Seq((1L, ts(5)), (1L, ts(5)), (1L, ts(5))).toDF("user_id", "ts")
    val out = RateAudit.peakRates(d, "user_id", "ts", 60L, 2L)
      .select("peak_in_window", "limited").as[(Long, Boolean)].head()
    assert(out === ((3L, true)))
  }
}
