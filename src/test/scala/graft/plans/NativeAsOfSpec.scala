package graft.plans

import graft.SparkSpec
import graft.relational.AsOfJoin
import org.apache.spark.sql.functions._

class NativeAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("hand-computed backward semantics: ties visible, stale keys null") {
    val purchases = Seq((1L, ts(10), "p1"), (1L, ts(20), "p2"),
      (2L, ts(10), "p3"), (3L, ts(5), "p4"))
      .toDF("user_id", "ts", "pid")
    val clicks = Seq((1L, ts(10), "c1"), (1L, ts(15), "c2"), (2L, ts(11), "c3"))
      .toDF("user_id", "ts", "cid")
      .withColumnRenamed("ts", "cts")
    val out = NativeAsOf.backward(purchases, clicks, Seq("user_id"),
      "ts", "cts", Seq("cid"))
      .select("pid", "asof_cid").as[(String, Option[String])]
      .collect().toMap
    // p1: click at SAME second visible; p2: latest earlier is c2;
    // p3: only click is at 11 > 10 → null; p4: key 3 has no clicks → null
    assert(out === Map("p1" -> Some("c1"), "p2" -> Some("c2"),
      "p3" -> None, "p4" -> None))
  }

  test("native result is bit-identical to the compositional union+window form") {
    val evs = graft.queries.Dsl.events(spark, sf0001)
    val purchases = evs.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = evs.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("value"))
    val native = NativeAsOf.backward(purchases, clicks, Seq("user_id"),
      "ts", "cts", Seq("cts", "value"))
      .select("event_id", "asof_cts", "asof_value")
    val composed = AsOfJoin.backward(purchases, clicks, Seq("user_id"),
      "ts", "cts", Seq("cts", "value"))
      .select("event_id", "asof_cts", "asof_value")
    assert(native.count() === purchases.count())
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "native and compositional as-of disagree")
  }

  test("plan is the native exec: no union, no window, SMJ-style exchanges") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "v")
    val r = Seq((1L, 5L, "x")).toDF("k", "rt", "w")
    val df = NativeAsOf.backward(l, r, Seq("k"), "t", "rt", Seq("w"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"native exec missing:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      s"native plan regressed to union+window:\n$plan")
  }

  test("forward direction: nearest at-or-after, head not consumed by a match") {
    val l = Seq((1L, 10L, "p1"), (1L, 10L, "p2"), (1L, 20L, "p3"), (2L, 5L, "p4"))
      .toDF("k", "t", "v")
    val r = Seq((1L, 10L, "c1"), (1L, 30L, "c2"), (3L, 1L, "c3"))
      .toDF("k", "rt", "w")
    val out = NativeAsOf.forward(l, r, Seq("k"), "t", "rt", Seq("w"))
      .select("v", "asof_w").as[(String, Option[String])].collect().toMap
    // p1 AND p2 both match c1 (equal-time tie inclusive, head not consumed);
    // p3's nearest later is c2; p4's key has no rights → null
    assert(out === Map("p1" -> Some("c1"), "p2" -> Some("c1"),
      "p3" -> Some("c2"), "p4" -> None))
  }

  test("forward parity with the compositional form on fixture events") {
    val evs = graft.queries.Dsl.events(spark, sf0001)
    val purchases = evs.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = evs.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("value"))
    val native = NativeAsOf.forward(purchases, clicks, Seq("user_id"),
      "ts", "cts", Seq("cts", "value"))
      .select("event_id", "asof_cts", "asof_value")
    val composed = AsOfJoin.forward(purchases, clicks, Seq("user_id"),
      "ts", "cts", Seq("cts", "value"))
      .select("event_id", "asof_cts", "asof_value")
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("NULL time columns follow DuckDB ASOF: nulls never match, lefts kept") {
    // DuckDB's l.t >= r.t is NULL on NULL ⇒ no match: a null-time right row
    // must never be picked (even by a null-time left), and a null-time left
    // row is emitted unmatched — in both directions
    val l = Seq((1L, Some(10L), "lt"), (1L, None, "ln"), (2L, None, "ln2"))
      .toDF("k", "t", "v")
    val r = Seq((1L, Some(5L), "rt"), (1L, None, "rn"), (2L, None, "rn2"))
      .toDF("k", "rt", "w")
    val back = NativeAsOf.backward(l, r, Seq("k"), "t", "rt", Seq("w"))
      .select("v", "asof_w").as[(String, Option[String])].collect().toMap
    assert(back === Map("lt" -> Some("rt"), "ln" -> None, "ln2" -> None))
    val fwd = NativeAsOf.forward(l, r, Seq("k"), "t", "rt", Seq("w"))
      .select("v", "asof_w").as[(String, Option[String])].collect().toMap
    // forward from t=10 finds nothing at-or-after (only right is at 5)
    assert(fwd === Map("lt" -> None, "ln" -> None, "ln2" -> None))
  }

  test("multiple partitions and empty right partitions behave (repartition stress)") {
    val left = (1L to 200L).map(i => (i % 7, i, s"l$i")).toDF("k", "t", "v")
      .repartition(13)
    val right = (1L to 50L).map(i => (i % 3, i * 2, s"r$i")).toDF("k", "rt", "w")
      .repartition(5)
    val native = NativeAsOf.backward(left, right, Seq("k"), "t", "rt", Seq("w"))
    val composed = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("w"))
    assert(native.count() === 200L)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }
}
