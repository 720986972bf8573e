package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil–Sen robust trend (Theil 1950, Sen 1968) per key over a daily
  * series — the slope estimator that shrugs off the outlier days OLS
  * bends toward: the MEDIAN of all pairwise slopes. The monitoring read:
  * "is this event type actually growing, ignoring the two incident
  * spikes?" — the robust companion to [[Profile.groupedRegression]]'s
  * OLS and [[Changepoint]]'s level-shift alarm.
  *
  * Exactness: x is the integer day index, each pairwise slope is the
  * truncating micro value 10⁶·(y₂−y₁) div (x₂−x₁) (negatives truncate
  * toward zero identically to DuckDB `//` — the house-verified rule), and
  * the median is the LOWER median (rank ⌈m/2⌉ of the slope-sorted pairs),
  * picked by row_number so it is a VALUE at a defined rank — tie order
  * among equal slopes cannot change it.
  *
  * Scale: the series per key is day-span-sized, so the within-key pair
  * join is O(days²) per key — ~400 rows per key-month, bounded by the
  * calendar, not the data; everything partitions by key (equi-join +
  * per-key window). Day-count aggregation is map-side combined.
  */
object TheilSen {

  /** (key, n_days, n_pairs, median_slope_micro_per_day) from per-(key,
    * day) event counts of `df`.
    */
  def dailyTrend(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = Stages.materialize(
      df.groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
        .agg(count(lit(1)).as("__y"))
        .withColumn("__x", datediff(col("__day"),
          min(col("__day")).over(Window.partitionBy(col(keyCol))))
          .cast("long")), "theilsen_daily")
    val slopes = daily.as("a").join(daily.as("b"),
      col(s"a.$keyCol") === col(s"b.$keyCol") && col("a.__x") < col("b.__x"))
      .select(col(s"a.$keyCol").as(keyCol),
        expr("(1000000L * (b.__y - a.__y)) div (b.__x - a.__x)").as("__s"),
        col("a.__x").as("__x1"), col("b.__x").as("__x2"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__s"), col("__x1"), col("__x2"))
    slopes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__m", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .filter(col("__rn") === expr("(__m + 1) div 2"))
      .join(daily.groupBy(col(keyCol)).agg(count(lit(1)).as("n_days")),
        Seq(keyCol))
      .select(col(keyCol), col("n_days"), col("__m").as("n_pairs"),
        col("__s").as("median_slope_micro_per_day"))
  }
}
