package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: persist both fact tables hash-bucketed on
  * the join key and the join needs NO exchange at read time — at 100 TB this
  * converts every recurring lineitem⋈orders join from a full-data shuffle
  * into co-located map-side work. Local demo with plan assertions.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("bucket_wh").toString
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")

    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_bucketed")
    ord.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_bucketed")

    // force a sort-merge join so the exchange question is real
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    val shufflesBeforeAgg = "ShuffleExchange|Exchange hashpartitioning\\(l_orderkey".r
      .findAllIn(plan).length
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not re-shuffle the join keys:\n$plan")

    // and it still returns the right answer
    val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBuckets === direct)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }
}
