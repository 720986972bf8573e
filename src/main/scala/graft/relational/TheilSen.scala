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

/** Mann–Kendall trend TEST (Mann 1945, Kendall 1975) — [[TheilSen]]'s
  * significance companion on the same series: the slope says how steep,
  * MK says whether a monotone trend is THERE at all, distribution-free.
  *   S = Σ_{i<j} sign(y_j − y_i),
  *   18·Var(S) = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)   (tie-corrected),
  * and the normal-approximation verdict |S| ≥ z·σ is taken SQRT-FREE by
  * squaring: 18·10⁶·S² ≥ z²micro·(18·Var) with the frozen χ²₁ literal —
  * the same squaring trick as the ratio-metric readout, so no libm
  * anywhere. (The normal approximation is textbook-valid for n ≥ 10;
  * the fixture's 30-day series clears it. The continuity correction
  * (|S|−1) is deliberately omitted — both engines replay the same
  * statistic, and at n ≥ 10 the correction flips only hairline calls.)
  *
  * Scale shape: IDENTICAL daily stage as [[TheilSen.dailyTrend]] — the
  * `Stages.materialize` memo keys on the canonicalized plan, so when
  * both run in one session the stage lands ONCE and both read it. The
  * pair join is per-key over the day-span-sized series (calendar-
  * bounded, not data-bounded); ties and day counts are keyed aggs.
  */
object MannKendall {

  /** (key, n_days, s_stat, var_num_18, trend, significant) per key;
    * trend ∈ up/down/flat by sign(S), significant by the squared normal
    * test at α = 5%. */
  def dailyTrend(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = Stages.materialize(
      df.groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
        .agg(count(lit(1)).as("__y"))
        .withColumn("__x", datediff(col("__day"),
          min(col("__day")).over(Window.partitionBy(col(keyCol))))
          .cast("long")), "theilsen_daily")
    val s = daily.as("a").join(daily.as("b"),
      col(s"a.$keyCol") === col(s"b.$keyCol") && col("a.__x") < col("b.__x"))
      .groupBy(col(s"a.$keyCol").as(keyCol))
      .agg(sum(when(col("b.__y") > col("a.__y"), 1L)
        .when(col("b.__y") < col("a.__y"), -1L).otherwise(0L)).as("s_stat"))
    val ties = daily.groupBy(col(keyCol), col("__y"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(keyCol))
      .agg(sum(expr("__t * (__t - 1) * (2 * __t + 5)")).as("__tie"),
        count(lit(1)).as("__distinct_y"))
    val nd = daily.groupBy(col(keyCol)).agg(count(lit(1)).as("n_days"))
    s.join(ties, Seq(keyCol)).join(nd, Seq(keyCol))
      .withColumn("var_num_18",
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - __tie"))
      .select(col(keyCol), col("n_days"), col("s_stat"), col("var_num_18"),
        when(col("s_stat") > 0L, "up").when(col("s_stat") < 0L, "down")
          .otherwise("flat").as("trend"),
        // var_num_18 = 0 means every daily y is tied (or n_days < 2): no
        // variance, no trend, and the bare inequality would read 0 >= 0 =
        // true — a constant series flagged significant (r10 advice). A
        // constant series is a legitimate input, so force false rather
        // than raise; the firing path still needs positive variance.
        expr("var_num_18 > 0 AND " +
          "CAST(18 AS DECIMAL(38,0)) * 1000000 * s_stat * s_stat >= " +
          s"${graft.relational.Experiment.SrmChi2CritMicro} * " +
          "CAST(var_num_18 AS DECIMAL(38,0))").as("significant"))
  }
}
