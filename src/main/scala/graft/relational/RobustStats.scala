package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Median/MAD robust outlier gate — the heavy-tail-safe cousin of the
  * z-score: mean/stddev blow up under the very outliers they should flag,
  * while the median and the median-absolute-deviation are 50 %-breakdown
  * estimators. The standard pre-training value-sanity gate for numeric
  * telemetry/feature columns.
  *
  * Determinism: `percentile` midpoints are IEEE-identical to DuckDB's
  * `quantile_cont` (proven by the value_quantiles row); the outlier rule
  * compares |x − med| > k·MAD — one subtraction, one multiply, one compare,
  * no division — so verdicts are bit-portable.
  *
  * Scale: two grouped percentile passes (the second over the residuals)
  * with category-sized results broadcast back; one conditional-aggregation
  * rollup. No windows, no non-broadcast joins.
  *
  * BOUNDED-GROUP CONTRACT: both the median and the MAD frames broadcast,
  * so `groupCol` must be category-like (event types, sources, quality
  * tiers), not key-like. `maxGroups` enforces it with a bounded probe
  * (the [[graft.vector.ClusterQuality]] `requireBoundedClasses`
  * precedent) — a user_id column fails loudly, not at the broadcast.
  */
object RobustStats {

  /** Per-group MAD outlier audit: (group, n, med, mad, n_outliers,
    * outlier_permille) flagging |x − med| > k·MAD. A constant column
    * (mad = 0) flags any deviation — the conventional MAD edge case.
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
                  k: Double = 3.0, maxGroups: Int = 4096): DataFrame = {
    val probe = df.select(col(groupCol)).distinct().limit(maxGroups + 1).count()
    require(probe <= maxGroups,
      s"madOutliers is a category-statistics operator: its two percentile " +
        s"frames broadcast, which needs a bounded group domain, but " +
        s"'$groupCol' has > $maxGroups distinct values — this is a key, " +
        "not a category (or raise maxGroups deliberately)")
    val v = df.select(col(groupCol).as("grp"), col(valCol).cast("double").as("v"))
    val med = v.groupBy(col("grp")).agg(expr("percentile(v, 0.5)").as("med"))
    val withAd = v.join(broadcast(med), Seq("grp"))
      .withColumn("ad", abs(col("v") - col("med")))
    val mad = withAd.groupBy(col("grp")).agg(expr("percentile(ad, 0.5)").as("mad"))
    withAd.join(broadcast(mad), Seq("grp"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("ad") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_permille", expr("(1000L * n_outliers) div n"))
      .withColumnRenamed("grp", groupCol)
  }
}
