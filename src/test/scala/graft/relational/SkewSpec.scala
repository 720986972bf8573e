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

  test("salted join equals the plain equi join exactly") {
    val ev = graft.queries.Dsl.events(spark, sf0001)
      .withColumn("custkey", (col("user_id") + 1).cast("long"))
    val dim = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))

    val plain = ev.join(dim, ev("custkey") === dim("c_custkey"))
      .groupBy("c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(ev, "custkey", dim, "c_custkey", col("event_id"), 8)
      .groupBy("c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("salted join matches each big row exactly once (no fanout)") {
    val big = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
    val small = Seq((1L, "dim1"), (2L, "dim2")).toDF("dk", "dv")
    val out = Skew.saltedJoin(big, "k", small, "dk", col("v"), 4)
    assert(out.count() === 3L)
    assert(out.columns.toSet === Set("k", "v", "dk", "dv"))
  }

  test("salt spreads a hot key over the requested bucket range") {
    val buckets = spark.range(10000)
      .select(Skew.salt(col("id"), 8).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(buckets.keySet === (0 until 8).toSet)
    assert(buckets.values.min > 500, "salt should spread roughly evenly")
  }
}
