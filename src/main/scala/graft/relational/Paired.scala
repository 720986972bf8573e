package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paired binary tests — the period-over-period question two-sample
  * machinery gets WRONG: "did conversion change from H1 to H2?" compared
  * as two independent proportions double-counts every user's stable
  * behavior as evidence; the same units appear on both sides, so only
  * the FLIPS carry information. McNemar's test (McNemar 1947) conditions
  * on exactly those: with b = 1→0 flips and c = 0→1 flips,
  *   χ² = (b − c)² / (b + c),
  * judged in micro against the frozen χ²₁ 5% critical literal — the
  * concordant cells (both-converted, neither) cancel out of the
  * statistic entirely, which is the whole point.
  *
  * Scale shape: ONE conditional aggregation per unit (map-side
  * combined) folds each user's two period outcomes, then ONE 1-row
  * aggregate counts the 2×2 table — no join, no window. The squared
  * discordance is carried in DECIMAL(38,0) (exact to b + c ≤ 3×10¹²
  * discordant units, where the micro readout itself would escape
  * BIGINT — past that it refuses loudly rather than overflowing).
  * Zero discordance (b + c = 0) makes the statistic undefined and
  * raises inside every output column (the pruned-assert lesson):
  * a dataset where nobody flips has nothing to test.
  */
object Paired {

  /** One row: n_units, n_both, n_neither, n_flip_10, n_flip_01,
    * chi2_micro, flip_flag — conversion flips between two user-defined
    * periods of one event log. `periodAWhen`/`periodBWhen` select the
    * rows of each period; `convWhen` marks a converting row.
    */
  def mcnemarFlip(events: DataFrame, unitCol: String, periodAWhen: Column,
                  periodBWhen: Column, convWhen: Column): DataFrame = {
    val perUnit = events.groupBy(col(unitCol))
      .agg(max(when(periodAWhen && convWhen, 1L).otherwise(0L)).as("__a"),
        max(when(periodBWhen && convWhen, 1L).otherwise(0L)).as("__b"))
    val g = perUnit.agg(
      count(lit(1)).as("n_units"),
      sum(expr("__a * __b")).as("n_both"),
      sum(expr("(1 - __a) * (1 - __b)")).as("n_neither"),
      sum(expr("__a * (1 - __b)")).as("n_flip_10"),
      sum(expr("(1 - __a) * __b")).as("n_flip_01"))
    val raise = "raise_error('mcnemarFlip: zero discordant units — " +
      "nobody flipped between the periods, the statistic is undefined') "
    // the squared discordance rides DECIMAL(38,0) (the powerCheck carry —
    // plain long wrapped past |b−c| ≈ 3.03e6, r10 advice); past 3e12
    // discordant units even the micro READOUT escapes BIGINT (max χ²micro
    // = 10⁶·(b+c)), so refuse loudly there rather than overflow the cast
    val sizeGuard = "n_flip_10 + n_flip_01 > 3000000000000"
    val sizeRaise = "raise_error('mcnemarFlip: past 3e12 discordant units " +
      "chi2_micro escapes BIGINT — de-scale or shard the readout first') "
    val chi2 = "(1000000 * CAST(n_flip_10 - n_flip_01 AS DECIMAL(38,0)) * " +
      "(n_flip_10 - n_flip_01)) div (n_flip_10 + n_flip_01)"
    g.select(col("n_units"), col("n_both"), col("n_neither"),
      col("n_flip_10"), col("n_flip_01"),
      expr("CASE WHEN COALESCE(n_flip_10, 0) + COALESCE(n_flip_01, 0) = 0 " +
        s"THEN $raise WHEN $sizeGuard THEN $sizeRaise ELSE " +
        s"$chi2 END").as("chi2_micro"),
      expr("CASE WHEN COALESCE(n_flip_10, 0) + COALESCE(n_flip_01, 0) = 0 " +
        s"THEN $raise WHEN $sizeGuard THEN $sizeRaise ELSE " +
        s"$chi2 > ${Experiment.SrmChi2CritMicro} END").as("flip_flag"))
  }
}
