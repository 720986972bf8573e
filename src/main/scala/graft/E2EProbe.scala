package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object E2EProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val stage = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("doc_id")).agg(max(col("n")).as("n"), max(col("source")).as("source"))
    val anchored = stage.observe("anchor_probe", count(lit(1))).repartition(col("doc_id"))
    val a = anchored.select("doc_id", "n")
    val b = anchored.filter(col("n") > 3).select("doc_id", "source")
    val j = a.join(b, "doc_id")
    j.count()
    println("=== OPTIMIZED ===")
    println(j.queryExecution.optimizedPlan.treeString)
    println("=== FINAL ===")
    println(j.queryExecution.executedPlan.treeString)
  }
}
