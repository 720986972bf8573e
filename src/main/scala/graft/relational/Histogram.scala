package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-depth histogram construction — the ANALYZE-stats primitive a
  * cost-based optimizer feeds on (selectivity of range predicates needs
  * depth-balanced buckets, not value-balanced ones): k buckets holding
  * (as nearly as possible) n/k rows each, with exact boundaries taken at
  * the remainder-first ntile ranks and exact per-bucket distinct counts
  * (the NDV-per-bucket a CBO multiplies selectivities from).
  *
  * Shape: one [[GlobalRank.byValue]] pass (two-phase value cells, NO
  * single-partition window), bucket = closed-form ntile from the rank,
  * then one (bucket) aggregation with a distinct count — two shuffles
  * total, corpus scanned once.
  */
object Histogram {

  /** (bucket, n_rows, n_distinct, lo, hi) per equi-depth bucket,
    * bucket order. `tieCol` must be a unique non-null key (the
    * GlobalRank contract). */
  def equiDepth(df: DataFrame, valueCol: String, tieCol: String,
                k: Int = 16): DataFrame = {
    require(k >= 2 && k <= 1024, s"equiDepth: k=$k outside 2..1024")
    val (ranked, n) = GlobalRank.byValue(df, valueCol, tieCol, "__r")
    ranked
      .withColumn("__b", GlobalRank.ntileFromRank("__r", n, k))
      .groupBy(col("__b").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(valueCol)).as("n_distinct"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
      .orderBy(col("bucket"))
  }
}
