package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: CSV, JSON, ORC round trips
  * with schema preservation (S7/S8 adjacents — the engine reads whatever the
  * lake serves).
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"))
    .limit(100)

  test("csv round trip preserves values with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("fmt_csv").toString
    base.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(base.schema).csv(dir)
    assert(back.count() === 100)
    assert(back.as[(Long, Long, String, Double)].collect().toSet ===
      base.as[(Long, Long, String, Double)].collect().toSet)
  }

  test("json lines round trip preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("fmt_json").toString
    base.write.mode("overwrite").json(dir)
    val back = spark.read.schema(base.schema).json(dir)
    assert(back.as[(Long, Long, String, Double)].collect().toSet ===
      base.as[(Long, Long, String, Double)].collect().toSet)
  }

  test("orc round trip preserves values and schema") {
    val dir = java.nio.file.Files.createTempDirectory("fmt_orc").toString
    base.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === base.schema)
    assert(back.as[(Long, Long, String, Double)].collect().toSet ===
      base.as[(Long, Long, String, Double)].collect().toSet)
  }
}
