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

  /** Per-group trimmed mean in exact cents — the robust location estimate
    * between the mean (0 % breakdown) and the median (throws away all
    * order information): drop `trimPermille` of the ROWS from each tail
    * by (value, tie) rank, average the rest. Reported beside the raw mean
    * so the gap IS the tail influence — the "how much were we being
    * lied to by outliers" number.
    *
    * Exactness: values in cents (DECIMAL(12,2)·100), the per-tail drop
    * count is the truncating (n·trim) div 1000, ranks are row_number over
    * the caller's total order (`tieCol` must make it total — enforced
    * nowhere cheaper than the caller), and both means are truncating
    * integer division.
    *
    * Scale: one per-group window (rank) + one keyed aggregation; group
    * cardinality is the OUTPUT size, so no bounded-group contract is
    * needed — nothing broadcasts.
    */
  def trimmedMean(df: DataFrame, groupCol: String, valCol: String,
                  tieCol: String, trimPermille: Long = 50L): DataFrame = {
    require(trimPermille >= 0 && trimPermille < 500,
      s"trimPermille must be in [0, 500), got $trimPermille")
    // rank on the cents projection (monotone in the value) + the tie
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__c"), col(tieCol))
    df.select(col(groupCol),
        (col(valCol).cast(org.apache.spark.sql.types.DecimalType(12, 2))
          * 100).cast("long").as("__c"), col(tieCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
      .withColumn("__t", expr(s"(__n * ${trimPermille}L) div 1000"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_rows"), max(col("__t")).as("n_trimmed_each"),
        sum(when(col("__rn") > col("__t") && col("__rn") <= col("__n") - col("__t"),
          1L).otherwise(0L)).as("kept_n"),
        sum(when(col("__rn") > col("__t") && col("__rn") <= col("__n") - col("__t"),
          col("__c")).otherwise(0L)).as("__ks"),
        sum(col("__c")).as("__ts"))
      .select(col(groupCol), col("n_rows"), col("n_trimmed_each"), col("kept_n"),
        expr("__ks div kept_n").as("trimmed_mean_cents"),
        expr("__ts div n_rows").as("raw_mean_cents"))
  }
}
