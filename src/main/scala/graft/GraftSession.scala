package graft

import org.apache.spark.sql.SparkSession

/** Recommended session wiring for this engine: UTC (oracle parity),
  * right-sized shuffle partitions for the local harness, nanos-parquet
  * compatibility for the events table, and the graft function/optimizer
  * registrations. Production clusters should additionally set
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftSession {

  def builder(master: String = "local[4]",
              shufflePartitions: Int = 4): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Build + register graft functions and the fold-fusion optimizer rule. */
  def create(master: String = "local[4]", shufflePartitions: Int = 4): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
