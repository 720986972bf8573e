package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nonparametric two-sample distribution tests, integer-exact: Mann–Whitney
  * U (with tie correction via the ½-count term) and the two-sample
  * Kolmogorov–Smirnov statistic, both computed from ONE value histogram —
  * the A/B answer to "did the value distribution shift?" that mean-based
  * monitors (bootstrap CI, trimmed means) miss when the shift is in shape,
  * not center.
  *
  * Exactness discipline: both statistics are RATIOS of integer counting
  * quantities, so they are carried as exact integers until one final
  * truncating division —
  *   - U is doubled (U2 = 2·U) so the tie term ½·cA·cB stays integral:
  *     U2 = Σ_v cA(v)·(2·cumB(<v) + cB(v)). The common-language effect
  *     (AUC = U/(nA·nB)) and rank-biserial r = 2U/(nA·nB) − 1 are permille
  *     integral divisions of U2.
  *   - KS D = max_v |F_A(v) − F_B(v)| is cross-multiplied to
  *     max_v |cumA(v)·nB − cumB(v)·nA| (an integer), then one div by
  *     nA·nB; the reported location is the SMALLEST value attaining the
  *     max (deterministic tiebreak).
  * Products reach n² — DECIMAL(38,0) on the Spark side, HUGEINT in the
  * oracle replay, never a double.
  *
  * Scale shape: one grouped aggregation builds the per-value histogram
  * (distinct-value-sized, NOT corpus-sized — cents of a bounded price
  * range, latency buckets, counts), then one ordered window over that
  * histogram computes both cumulatives. The window is single-partition
  * over the HISTOGRAM, which is the documented bounded-model contract:
  * `maxDistinctValues` refuses loudly (the RobustStats/QuantileRank
  * precedent) rather than silently planning a corpus-sized single
  * partition. A value domain wider than the cap should be pre-bucketed
  * (equi-depth histogram, O146) before testing.
  */
object TwoSample {

  /** One-row frame: n_a, n_b, auc_permille, rank_biserial_permille,
    * ks_permille, ks_at_value.
    *
    * @param df    input rows (pre-filter rows belonging to neither sample)
    * @param isA   boolean column: true → sample A, false → sample B
    * @param value integral-valued column (cents, counts, bucket ids)
    * @param maxDistinctValues loud cap on the histogram size
    */
  def mannWhitneyKs(df: DataFrame, isA: Column, value: Column,
                    maxDistinctValues: Long = 1000000L): DataFrame = {
    val hist = df
      .select(value.cast("long").as("v"), isA.as("__a"))
      .groupBy(col("v"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("cb"))
    // the histogram is the bounded model every later pass runs over — land
    // it once (it feeds the guard count, the cumulative window, and the
    // argmax re-read) and refuse loudly past the cap instead of silently
    // planning a corpus-sized single partition
    val landed = Stages.pin(hist)
    val nv = landed.limit((maxDistinctValues + 1).toInt).count()
    require(nv <= maxDistinctValues,
      s"mannWhitneyKs: more than $maxDistinctValues distinct values — " +
        "pre-bucket the domain (equi-depth histogram) before testing")
    // ONE ordered pass over the histogram: the running cumulatives and the
    // grand totals ride the SAME window exchange (full-frame sums — the
    // ddsketch-totals precedent, r16 guide §2.4), and U2 / KS max / KS
    // argmax / totals collapse into ONE final aggregation. The r15 shape
    // re-executed the window subtree once per consumer (totals, stats,
    // argmax join, final assembly — 4 executions + 2 joins + 5 broadcast
    // nested loops).
    val wRun = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val cum = landed
      .withColumn("cuma", sum(col("ca")).over(wRun))
      .withColumn("cumb", sum(col("cb")).over(wRun))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .withColumn("d", expr(
        "abs(CAST(cuma AS DECIMAL(38,0)) * nb - CAST(cumb AS DECIMAL(38,0)) * na)"))
    // KS location = smallest v attaining max d: min of (−d, v) pairs is the
    // lexicographic argmax with the deterministic smallest-v tiebreak (no
    // max_by, whose tie behavior is undefined)
    cum.agg(
      max(col("na")).as("na"), max(col("nb")).as("nb"),
      sum(expr("CAST(ca AS DECIMAL(38,0)) * (2 * (cumb - cb) + cb)")).as("u2"),
      max(col("d")).as("ksx"),
      min(struct(negate(col("d")).as("nd"), col("v").as("v"))).as("__mn"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        expr("(500 * u2) div (CAST(na AS DECIMAL(38,0)) * nb)")
          .as("auc_permille"),
        expr("(1000 * (u2 - CAST(na AS DECIMAL(38,0)) * nb)) div " +
          "(CAST(na AS DECIMAL(38,0)) * nb)").as("rank_biserial_permille"),
        expr("(1000 * ksx) div (CAST(na AS DECIMAL(38,0)) * nb)")
          .as("ks_permille"),
        col("__mn").getField("v").as("ks_at_value"))
  }
}
