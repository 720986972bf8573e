package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed table lands once per (context, tag); dirs get distinct tables") {
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("k", "v")
    val t1 = Bucketing.ensureBucketed(df, "graft_test_bk", "tagA", "k", 4)
    val rows1 = spark.table(t1).count()
    assert(rows1 === 100L)
    // second call with the same tag is a memo hit: different data must NOT
    // overwrite (the landed snapshot is the contract)
    val df2 = (1L to 5L).map(i => (i, i)).toDF("k", "v")
    val t1b = Bucketing.ensureBucketed(df2, "graft_test_bk", "tagA", "k", 4)
    assert(t1b === t1 && spark.table(t1).count() === 100L)
    // a DIFFERENT tag gets its own table — no cross-dir aliasing
    val t2 = Bucketing.ensureBucketed(df2, "graft_test_bk", "tagB", "k", 4)
    assert(t2 !== t1)
    assert(spark.table(t2).count() === 5L)
    assert(spark.table(t1).count() === 100L)
  }

  test("streamSession clone carries its own conf; caller session untouched") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val ss = graft.queries.Dsl.streamSession(spark, parts = 8)
    assert(ss.conf.get("spark.sql.shuffle.partitions") === "8")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
    // clones share the context (one JVM scheduler, shared catalog)
    assert(ss.sparkContext eq spark.sparkContext)
  }
}
