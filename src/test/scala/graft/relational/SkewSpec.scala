package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation equals the plain GROUP BY exactly") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val dec = (c: String) => col(c).cast(DecimalType(12, 2))

    val plain = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(dec("l_extendedprice")).as("s"))
      .select(col("l_returnflag"), col("n"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().toSet

    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"), "l_orderkey", 16,
      Seq(dec("l_extendedprice") -> "s"))
      .select(col("l_returnflag"), col("n"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().toSet

    assert(salted === plain)
  }

  test("salt spreads a hot key over the requested bucket range") {
    val buckets = spark.range(10000)
      .select(Skew.salt(col("id"), 8).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(buckets.keySet === (0 until 8).toSet)
    assert(buckets.values.min > 500, "salt should spread roughly evenly")
  }
}
