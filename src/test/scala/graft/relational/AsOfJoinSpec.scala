package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of picks nearest earlier right row, inclusive on ties") {
    val left = Seq(("k1", 10L, "L10"), ("k1", 20L, "L20"), ("k1", 5L, "L5"),
      ("k2", 10L, "M10")).toDF("key", "t", "lv")
    val right = Seq(("k1", 8L, "R8"), ("k1", 10L, "R10"), ("k1", 15L, "R15"),
      ("k3", 1L, "X")).toDF("key", "t", "rv")

    val got = AsOfJoin.backward(left, right, Seq("key"), "t", "t", Seq("rv"))
      .select("key", "t", "lv", "asof_rv").as[(String, Long, String, String)]
      .collect().toSet

    assert(got === Set(
      ("k1", 10L, "L10", "R10"),  // tie: right at t=10 visible (inclusive)
      ("k1", 20L, "L20", "R15"),
      ("k1", 5L, "L5", null),     // nothing earlier → null (left-join shape)
      ("k2", 10L, "M10", null)))  // key with no right rows at all
  }

  test("plan is union+window: no nested-loop join node") {
    val left = Seq(("k", 1L, "a")).toDF("key", "t", "lv")
    val right = Seq(("k", 1L, "b")).toDF("key", "t", "rv")
    val plan = AsOfJoin.backward(left, right, Seq("key"), "t", "t", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"as-of must not nested-loop:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
