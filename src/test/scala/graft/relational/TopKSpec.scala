package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("bounded-heap top-k equals the window row_number formulation") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val sortSpec = Seq("l_extendedprice" -> false, "l_orderkey" -> true,
      "l_linenumber" -> true)

    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).drop("rn")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .as[(String, Long, Int, Double)].collect().toSet

    val viaHeap = TopK.perGroup(li, Seq("l_returnflag"), sortSpec, 7)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .as[(String, Long, Int, Double)].collect().toSet

    assert(viaHeap === viaWindow)
  }

  test("handles keys with fewer than k rows and null sort values") {
    val df = Seq(
      ("a", Some(3.0)), ("a", None), ("b", Some(1.0)),
      ("a", Some(5.0)), ("a", Some(4.0))).toDF("k", "v")
    val got = TopK.perGroup(df, Seq("k"), Seq("v" -> false), 2)
      .as[(String, Option[Double])].collect().toSet
    // nulls sort last → never in top-2 when 2 non-null values exist
    assert(got === Set(("a", Some(5.0)), ("a", Some(4.0)), ("b", Some(1.0))))
  }

  test("partial phase bounds candidate volume per partition") {
    val df = spark.range(100000)
      .select((col("id") % 4).cast("string").as("k"), col("id").cast("double").as("v"))
      .repartition(8)
    val out = TopK.perGroup(df, Seq("k"), Seq("v" -> false), 5)
    assert(out.count() === 20) // 4 keys × 5
    val expected = (0 until 4).flatMap { k =>
      // ids congruent to k mod 4, top 5 by value
      (0 until 5).map(i => (k.toString, (99999 - ((99999 - k) % 4) - 4L * i).toDouble))
    }.toSet
    assert(out.as[(String, Double)].collect().toSet === expected)
  }
}
