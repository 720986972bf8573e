package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact quantile-rank normalization — map a numeric column to its corpus
  * percentile rank (permille of rows STRICTLY below, midpoint-free): the
  * scale-free score calibration used to mix heterogeneous quality signals
  * ("this doc is in the 87th permille by NB margin") and the exact twin of
  * rank-based feature scaling.
  *
  * Shape: aggregate to the distinct-value frame (bounded for integer
  * scores), exclusive running count via the two-phase [[PrefixSum]] (no
  * global window), broadcast-join the CDF back on the value. Every number
  * is an exact integer; rank_permille = 1000·below / n.
  */
object QuantileRank {

  /** Adds `outCol` = permille rank (0‥999) of `valCol` (strictly-below
    * count over total). Identical values share a rank — the standard
    * "fraction below" CDF convention.
    */
  def permilleRank(df: DataFrame, valCol: String, outCol: String): DataFrame = {
    val dist = df.groupBy(col(valCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val (cum, total) = PrefixSum.runningSum(dist, "__v", "__c", "__cum")
    require(total > 0, "quantile rank of an empty frame")
    // exclusive below-count: inclusive prefix minus own bucket
    val cdf = cum.select(col("__v"),
      (col("__cum") - col("__c")).as("__below"))
    df.join(broadcast(cdf), df(valCol) === cdf("__v"))
      .withColumn(outCol, expr(s"(1000L * __below) div ${total}L"))
      .drop("__v", "__below")
  }
}
