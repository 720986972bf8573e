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

  test("top-k churn: a stable skewed head reads high Jaccard, a swap is seen") {
    // keys 1..3 dominate BOTH halves (stable head); key 4 appears only
    // in h1's top-k and key 5 only in h2's. k=4:
    // h1 top4 = {1,2,3,4}, h2 top4 = {1,2,3,5} -> common 3, union 5,
    // jaccard 600. Ranks: 1,2,3 hold positions -> shift 0.
    val h1 = Seq.fill(40)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(20)(3L) ++
      Seq.fill(10)(4L)
    val h2 = Seq.fill(40)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(20)(3L) ++
      Seq.fill(10)(5L)
    val d = (h1.zipWithIndex.map { case (k, i) => (k, ts(i.toLong)) } ++
      h2.zipWithIndex.map { case (k, i) => (k, ts(1000L + i)) })
      .toDF("k", "ts")
    val out = Drift.topkChurn(d, "k", "ts", k = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(out === ((4L, 4L, 4L, 3L, 600L, 0L)))
  }

  test("top-k churn rank displacement counts order moves among common members") {
    // h1: a>b>c; h2: c>b>a — same set, fully reversed order:
    // shifts |1-3| + |2-2| + |3-1| = 4, jaccard 1000
    val h1 = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    val h2 = Seq.fill(10)("a") ++ Seq.fill(20)("b") ++ Seq.fill(30)("c")
    val d = (h1.zipWithIndex.map { case (k, i) => (k, ts(i.toLong)) } ++
      h2.zipWithIndex.map { case (k, i) => (k, ts(1000L + i)) })
      .toDF("k", "ts")
    val out = Drift.topkChurn(d, "k", "ts", k = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(out === ((3L, 3L, 3L, 3L, 1000L, 4L)))
  }

  test("top-k churn refuses an empty input loudly (Jaccard undefined)") {
    val empty = Seq.empty[(Long, java.sql.Timestamp)].toDF("k", "ts")
    val e = intercept[Exception] {
      Drift.topkChurn(empty, "k", "ts", k = 3).collect()
    }
    assert(e.getMessage.contains("topkChurn") ||
      Option(e.getCause).exists(_.getMessage.contains("topkChurn")))
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
