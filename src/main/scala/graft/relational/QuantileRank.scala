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
  *
  * BOUNDED-DOMAIN CONTRACT: the CDF frame the rank join broadcasts is
  * distinct-value-sized — fine for integer scores (permilles, bit-scaled
  * margins, counts), data-sized for a continuous double column, where the
  * broadcast would OOM the driver at scale. `maxDistinct` enforces the
  * contract with a bounded probe (`limit(cap+1)`, the dense-vocabulary
  * discipline of [[graft.dedup.Dedup]]): misuse fails loudly instead of
  * failing the cluster.
  */
object QuantileRank {

  /** Adds `outCol` = permille rank (0‥999) of `valCol` (strictly-below
    * count over total). Identical values share a rank — the standard
    * "fraction below" CDF convention. `valCol` must be non-null (a NULL
    * never equals the join key, so it would silently vanish from the
    * output — we fail loudly instead, the [[PrefixSum]] precedent).
    */
  def permilleRank(df: DataFrame, valCol: String, outCol: String,
                   maxDistinct: Int = 200000): DataFrame = {
    // ONE bounded probe job covers both contracts: the distinct frame
    // includes a NULL row iff the column has NULLs, and its (capped) size
    // is the broadcast-feasibility statistic
    val probe = df.select(col(valCol)).distinct().limit(maxDistinct + 1).collect()
    require(!probe.exists(_.isNullAt(0)),
      s"permilleRank: '$valCol' contains NULLs — a NULL has no rank and " +
        "would be silently dropped by the CDF join; filter or impute first")
    require(probe.length <= maxDistinct,
      s"permilleRank: '$valCol' has > $maxDistinct distinct values — the " +
        "broadcast CDF is bounded only for discrete score domains " +
        "(integer permilles, bit-scaled margins), not continuous doubles; " +
        "bucketize the column or raise maxDistinct deliberately")
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
