package graft.relational

import graft.SparkSpec

class JoinPreflightSpec extends SparkSpec {
  import spark.implicits._

  test("the estimate IS the join's exact output size") {
    val left = Seq("a", "a", "b", "c", "c", "c").toDF("k")
    val right = Seq("a", "a", "a", "b", "d").toDF("k")
    val out = JoinPreflight.cardinality(left, "k", right, "k")
      .as[(String, Long, String, Long)].collect().head
    val actual = left.join(right, Seq("k")).count()
    assert(out._1.toLong === actual)
    // a: 2·3 = 6, b: 1·1 = 1 → est 7, worst key a at (1000·6) div 7
    assert(out === (("7", 2L, "6", 857L)))
  }

  test("NULL keys never match and are excluded from the pre-flight") {
    val left = Seq(Some("a"), None, None).toDF("k")
    val right = Seq(Some("a"), None).toDF("k")
    val out = JoinPreflight.cardinality(left, "k", right, "k")
      .as[(String, Long, String, Long)].collect().head
    assert(out === (("1", 1L, "1", 1000L)))
  }
}
