package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment-assignment primitives: deterministic hash bucketing into
  * arms and the sample-ratio-mismatch (SRM) gate every experiment
  * readout must pass FIRST — a biased split makes every downstream
  * metric comparison invalid (Fabijan et al. 2019's most-common
  * experimentation pitfall).
  *
  * Assignment is the house portable hash: arm = md5₆₀(salt ‖ unit) mod
  * arms — stable across engines, reruns, and scale (the same unit always
  * lands in the same arm; no rand(), no state). The SRM statistic for a
  * 50/50 split collapses to χ² = (n_a − n_b)²/n, carried in micro as one
  * truncating division; the threshold is the frozen χ²₁ 5% critical
  * value 3.841459 (a literal both engines share, the linear-counting LUT
  * discipline).
  */
object Experiment {

  /** χ²₁ critical value at α = 0.05, in micro — frozen literal. */
  val SrmChi2CritMicro: Long = 3841459L

  /** χ²₁₅ critical value at α = 0.05, in micro — frozen literal (the
    * 16-bucket uniformity test's degrees of freedom). */
  val Chi2Crit15Micro: Long = 24995790L

  /** Deterministic arm for a unit column: md5₆₀(salt:unit) mod arms. */
  def arm(unit: Column, salt: String, arms: Int = 2): Column =
    pmod(graft.functions.HashFunctions.md5Bits60(
      concat(lit(salt + ":"), unit.cast("string"))), lit(arms.toLong))

  /** One-row A/A readout over an event log: split-health (SRM) plus the
    * per-arm conversion comparison that must come out flat under a null
    * assignment — the harness a real experiment reuses with a treatment.
    * Columns: n_a, n_b, srm_chi2_micro, srm_flag, conv_a_permille,
    * conv_b_permille, lift_permille.
    */
  def srmConversionCheck(events: DataFrame, unitCol: String,
                         convWhen: Column, salt: String): DataFrame = {
    val units = events
      .select(col(unitCol).as("u"),
        when(convWhen, 1L).otherwise(0L).as("__c"))
      .groupBy(col("u"))
      .agg(max(col("__c")).as("converted"))
      .withColumn("arm", arm(col("u"), salt))
    units.agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 0L, col("converted")).otherwise(0L)).as("__ca"),
      sum(when(col("arm") === 1L, col("converted")).otherwise(0L)).as("__cb"))
      .select(col("n_a"), col("n_b"),
        expr("(1000000L * (n_a - n_b) * (n_a - n_b)) div (n_a + n_b)")
          .as("srm_chi2_micro"),
        (expr("(1000000L * (n_a - n_b) * (n_a - n_b)) div (n_a + n_b)") >
          SrmChi2CritMicro).as("srm_flag"),
        expr("(1000L * __ca) div n_a").as("conv_a_permille"),
        expr("(1000L * __cb) div n_b").as("conv_b_permille"),
        // lift of B over A, cross-multiplied so truncation happens once
        expr("(1000L * (__cb * n_a - __ca * n_b)) div (__ca * n_b)")
          .as("lift_permille"))
  }

  /** CUPED adjusted lift (Deng et al. 2013) — the industry-standard
    * variance-reduction readout: regress the outcome on a PRE-EXPERIMENT
    * covariate (θ = cov(x,y)/var(x)) and compare arms on the adjusted
    * outcome y − θ(x − x̄), which removes the covariate's share of the
    * variance (1 − ρ²) without biasing the lift (assignment is
    * independent of pre-period behavior).
    *
    * Exactness: everything reduces to GLOBAL and PER-ARM integer sums —
    * no per-row adjusted value is ever materialized, because the arm mean
    * of the adjustment is itself a linear function of the sums:
    *   Σ_arm adj · 10⁶ · n = 10⁶·n·Σ_arm y − θ_micro·(n·Σ_arm x − n_arm·Σx).
    * θ is one truncating division (micro); ρ² is computed as
    * ((1000·A) div B)·A div C (A = n·Σxy−ΣxΣy, B = n·Σxx−Σx²,
    * C = n·Σyy−Σy²) — truncated twice in a FIXED order both engines
    * replay, avoiding A² which would overflow 38 digits at extreme n.
    * Degenerate covariate or outcome (B = 0 or C = 0) refuses loudly.
    *
    * Input: a per-unit frame with columns (arm ∈ {0,1}, x, y) — the
    * caller prepares pre-period covariate x and outcome y per unit.
    * One-row output: n_units, theta_micro, corr2_permille,
    * raw_lift_milli, adjusted_lift_milli (B − A, outcome milli-units).
    */
  def cupedAdjustedLift(perUnit: DataFrame): DataFrame = {
    // ONE global agg carries the per-arm sums as conditional aggregates —
    // always exactly one output row, so an empty arm shows up as n_a/n_b = 0
    // and can be refused loudly (the old filtered-broadcast crossJoin
    // silently produced ZERO rows when an arm was empty — no row, no error)
    val g = perUnit.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0L, col("x")).otherwise(lit(0L))).as("sx_a"),
      sum(when(col("arm") === 0L, col("y")).otherwise(lit(0L))).as("sy_a"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1L, col("x")).otherwise(lit(0L))).as("sx_b"),
      sum(when(col("arm") === 1L, col("y")).otherwise(lit(0L))).as("sy_b"))
    val armGuard = "COALESCE(n_a, 0) = 0 OR COALESCE(n_b, 0) = 0"
    val j = g
      .withColumn("__A", expr("n * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("__B", expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("__C", expr("n * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
    // loud degenerate-input guards ride the output expressions (the
    // pruned-assert lesson): an empty arm or a constant covariate/outcome
    // makes the readout undefined — every column raises, none goes null
    j.select(
        expr(s"CASE WHEN $armGuard THEN " +
          "raise_error('cuped: empty arm — both arm 0 and arm 1 need at " +
          "least one unit') ELSE CAST(n AS BIGINT) END").as("n_units"),
        expr(s"CASE WHEN $armGuard THEN " +
          "raise_error('cuped: empty arm — both arm 0 and arm 1 need at " +
          "least one unit') WHEN __B = 0 THEN " +
          "raise_error('cuped: constant covariate (var x = 0)') " +
          "ELSE CAST((1000000 * __A) div __B AS BIGINT) END").as("theta_micro"),
        expr(s"CASE WHEN $armGuard THEN " +
          "raise_error('cuped: empty arm — both arm 0 and arm 1 need at " +
          "least one unit') WHEN __C = 0 THEN " +
          "raise_error('cuped: constant outcome (var y = 0)') " +
          "ELSE CAST((((1000 * __A) div __B) * __A) div __C AS BIGINT) END")
          .as("corr2_permille"),
        expr(s"CASE WHEN $armGuard THEN " +
          "raise_error('cuped: empty arm — both arm 0 and arm 1 need at " +
          "least one unit') ELSE " +
          "CAST((1000 * (CAST(sy_b AS DECIMAL(38,0)) * n_a - " +
          "CAST(sy_a AS DECIMAL(38,0)) * n_b)) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) END")
          .as("raw_lift_milli"),
        expr(s"CASE WHEN $armGuard THEN " +
          "raise_error('cuped: empty arm — both arm 0 and arm 1 need at " +
          "least one unit') WHEN __B = 0 THEN " +
          "raise_error('cuped: constant covariate (var x = 0)') " +
          "ELSE CAST((1000 * (" +
          "(1000000 * CAST(n AS DECIMAL(38,0)) * sy_b - " +
          " ((1000000 * __A) div __B) * (n * CAST(sx_b AS DECIMAL(38,0)) - n_b * sx)) * n_a - " +
          "(1000000 * CAST(n AS DECIMAL(38,0)) * sy_a - " +
          " ((1000000 * __A) div __B) * (n * CAST(sx_a AS DECIMAL(38,0)) - n_a * sx)) * n_b" +
          ")) div (1000000 * CAST(n AS DECIMAL(38,0)) * n_a * n_b) AS BIGINT) END")
          .as("adjusted_lift_milli"))
  }

  /** Per-arm exact quantile comparison — the experiment readout mean-based
    * lifts wash out (a treatment that moves the p90 and not the median is
    * invisible to a mean, and vice versa): exact p50/p90 per md5 arm via
    * [[GlobalRank.byValue]] (no single-partition window; lower-bound pick
    * at rank ⌈q·n⌉ — tie-permutation invariant because the picked VALUE
    * at a rank is a function of the sorted multiset), shifts in permille
    * by one truncating division. One-row output:
    * (n_a, n_b, p50_a, p90_a, p50_b, p90_b, p50_shift_permille,
    * p90_shift_permille).
    */
  def quantileShift(df: DataFrame, unitCol: String, tieCol: String,
                    value: Column, salt: String): DataFrame = {
    val scored = df.select(arm(col(unitCol), salt).as("__arm"),
      value.cast("long").as("v"), col(tieCol).as("__tie"))
    def armStats(armId: Long, tag: String): DataFrame = {
      val sub = scored.filter(col("__arm") === armId)
        .select(col("v"), col("__tie"))
      val (ranked, n) = GlobalRank.byValue(sub, "v", "__tie", "__r")
      require(n > 0, s"quantileShift: arm $armId is empty")
      val r50 = (500L * n + 999L) / 1000L
      val r90 = (900L * n + 999L) / 1000L
      ranked.filter(col("__r") === r50).select(col("v").as(s"p50_$tag"))
        .crossJoin(broadcast(ranked.filter(col("__r") === r90)
          .select(col("v").as(s"p90_$tag"))))
        .withColumn(s"n_$tag", lit(n))
    }
    armStats(0L, "a").crossJoin(broadcast(armStats(1L, "b")))
      .select(col("n_a"), col("n_b"), col("p50_a"), col("p90_a"),
        col("p50_b"), col("p90_b"),
        expr("(1000L * (p50_b - p50_a)) div p50_a").as("p50_shift_permille"),
        expr("(1000L * (p90_b - p90_a)) div p90_a").as("p90_shift_permille"))
  }

  /** Benjamini–Hochberg FDR screen over per-segment SRM χ²s (Benjamini &
    * Hochberg 1995) — the multiple-testing discipline a segment-sliced
    * guardrail needs: screening m segments at α each inflates the family
    * false-alarm rate to ≈ mα, so a platform that pages on ANY segment's
    * SRM pages constantly. BH controls the false-discovery rate instead:
    * sort p ascending, reject ranks 1..k where k = max{i : p₍ᵢ₎ ≤ q·i/m}.
    *
    * Integer form without ever computing a p-value: p is a MONOTONE
    * transform of the χ² statistic, so "p₍ᵢ₎ ≤ q·i/m" is exactly
    * "χ²₍ᵢ₎ ≥ F⁻¹(1 − q·i/m)" — and those m critical values are frozen
    * LITERALS at query-definition time (the transcendental-literal
    * discipline: both engines compare against the same micro constants;
    * rank i's critical value DECREASES with i). The caller's LUT length
    * IS the family size m; a limit-probed count refuses loudly when the
    * data disagrees, because a p = q·i/m quantile is only meaningful for
    * the m it was frozen for.
    *
    * Scale: per-(segment, unit) distinct (map-side combined), one keyed
    * aggregate to m rows, then rank/max windows over the m-row frame only
    * (bounded by the LUT-arity require — never a corpus-wide window).
    * Deterministic tie order: (χ² desc, segment asc).
    */
  def fdrScreen(df: DataFrame, segmentCol: String, unitCol: String,
                armCol: Column, critMicroByRank: Seq[Long]): DataFrame = {
    val m = critMicroByRank.size
    require(m >= 1 && m <= 64, "fdrScreen: LUT arity must be in [1, 64]")
    require(critMicroByRank.zip(critMicroByRank.tail).forall { case (a, b) => a >= b },
      "fdrScreen: critical values must be non-increasing in rank (p = q*i/m grows with i)")
    val su = df.select(col(segmentCol).as("segment"), col(unitCol).as("__u"),
      armCol.cast("long").as("__arm")).distinct()
    val perSeg = su.groupBy(col("segment")).agg(
      sum(when(col("__arm") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__arm") === 1L, 1L).otherwise(0L)).as("n_b"))
      // DECIMAL(38,0) carry for the squared imbalance (the powerCheck
      // discipline): a planted whole-segment fault makes |n_a − n_b| the
      // segment size, and plain long wrapped past ≈3.03e6 (r10 advice)
      .withColumn("chi2_micro",
        expr("CASE WHEN n_a + n_b > 3000000000000 THEN " +
          "raise_error('fdrScreen: past 3e12 units per segment chi2_micro " +
          "escapes BIGINT — shard the segment counts first') ELSE " +
          "(1000000 * CAST(n_a - n_b AS DECIMAL(38,0)) * (n_a - n_b)) " +
          "div (n_a + n_b) END"))
    val segProbe = perSeg.select(col("segment")).limit(m + 1).collect()
    require(segProbe.length == m,
      s"fdrScreen: ${segProbe.length} segments found (limit-probed at ${m + 1}) " +
        s"but the frozen LUT is for m = $m — refreeze the critical values")
    // the windows below are global over the m-row segment frame ONLY
    // (m <= 64 by the requires above) — the bounded-frame window class,
    // not a corpus window
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("chi2_micro").desc, col("segment").asc)
    val wAll = wRank.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val critMap = typedLit(critMicroByRank.zipWithIndex
      .map { case (c, i) => (i + 1).toLong -> c }.toMap)
    perSeg
      .withColumn("bh_rank", row_number().over(wRank).cast("long"))
      .withColumn("crit_micro", element_at(critMap, col("bh_rank")))
      .withColumn("__kmax", max(when(col("chi2_micro") >= col("crit_micro"),
        col("bh_rank")).otherwise(0L)).over(wAll))
      .withColumn("bh_reject", col("bh_rank") <= col("__kmax"))
      .select(col("segment"), col("n_a"), col("n_b"), col("chi2_micro"),
        col("bh_rank"), col("crit_micro"), col("bh_reject"))
  }

  /** Delta-method readout for RATIO metrics (Deng, Knoblich & Lu 2018) —
    * the metric class unit-level means cannot express: revenue per
    * session, clicks per view, items per order all divide two SUMS whose
    * denominator varies per unit, so Var(R̂) needs the first-order
    * expansion Var(R̂) ≈ (σ_y² − 2Rσ_xy + R²σ_x²)/(n·x̄²). Clearing
    * denominators gives ONE integer rational per arm:
    *   Var(R̂) = N1 / (Sx⁴·(n−1)),
    *   N1 = Sx²(nΣy²−Sy²) − 2·Sy·Sx(nΣxy−SxSy) + Sy²(nΣx²−Sx²),
    * carried in micro by TWO truncating divisions in a fixed order —
    * ((10⁶·N1) div Sx²) div (Sx²(n−1)) — which caps the largest
    * intermediate at 10⁶·N1 instead of Sx⁴·n (the overflow driver at
    * 1e12-count scale; doubles the exact reach vs the one-shot division).
    *
    * Significance WITHOUT sqrt: |Δ| ≥ z·SE ⇔ Δ² ≥ z²·(Var_a + Var_b),
    * compared exactly in integers — 10⁶·delta_milli² ≥ z²micro·(va+vb)
    * with the frozen z² = χ²₁ literal. No libm anywhere.
    *
    * Input: per-unit (arm ∈ {0,1}, x ≥ 0, y) — x the denominator count,
    * y the numerator. One row out: n_a, n_b, ratio_a_milli, ratio_b_milli,
    * delta_milli (cross-multiplied, one truncation), var_a_micro,
    * var_b_micro, significant. Empty arm / zero denominator / n = 1
    * refuse loudly (guards ride every output column — the pruned-assert
    * lesson).
    */
  def ratioMetricDelta(perUnit: DataFrame): DataFrame = {
    def armAgg(a: Int, t: String) = Seq(
      sum(when(col("arm") === a, 1L).otherwise(0L)).as(s"n_$t"),
      sum(when(col("arm") === a, col("x")).otherwise(lit(0L))).as(s"sx_$t"),
      sum(when(col("arm") === a, col("y")).otherwise(lit(0L))).as(s"sy_$t"),
      sum(when(col("arm") === a,
        expr("CAST(x AS DECIMAL(38,0)) * x")).otherwise(lit(0L))).as(s"sxx_$t"),
      sum(when(col("arm") === a,
        expr("CAST(x AS DECIMAL(38,0)) * y")).otherwise(lit(0L))).as(s"sxy_$t"),
      sum(when(col("arm") === a,
        expr("CAST(y AS DECIMAL(38,0)) * y")).otherwise(lit(0L))).as(s"syy_$t"))
    val aggs = armAgg(0, "a") ++ armAgg(1, "b")
    val g = perUnit.agg(aggs.head, aggs.tail: _*)
    val guard = "COALESCE(n_a, 0) < 2 OR COALESCE(n_b, 0) < 2 " +
      "OR sx_a = 0 OR sx_b = 0"
    val raise = "raise_error('ratioMetricDelta: each arm needs >= 2 units " +
      "and a nonzero denominator sum') "
    // loud exact-reach guards (r10 advice): the first fixed-order quotient
    // (10⁶·N1) div Sx² is an IntegralDivide whose BIGINT result silently
    // nulls past long range in non-ANSI Spark while the oracle's HUGEINT
    // keeps precision — refuse BEFORE the quotient instead. Two stages:
    // Sx ≤ 3e12 so the 9e12·Sx² comparison below stays inside 38 digits,
    // then |N1| ≤ 9e12·Sx² so the quotient (×10⁶) stays inside BIGINT.
    def reachGuard(t: String): String =
      s"WHEN sx_$t > 3000000000000 THEN raise_error('ratioMetricDelta: " +
        s"past 3e12 denominator units per arm the exact-reach check itself " +
        s"escapes 38-digit decimals — shard the arm sums first') " +
        s"WHEN abs(__n1$t) > CAST(9000000000000 AS DECIMAL(38,0)) * " +
        s"(CAST(sx_$t AS DECIMAL(38,0)) * sx_$t) THEN raise_error(" +
        s"'ratioMetricDelta: variance numerator exceeds the exact micro " +
        s"reach (|N1| > 9e12*Sx^2) — de-scale the metric first') "
    val j = g
      .withColumn("__n1a", expr(
        "CAST(sx_a AS DECIMAL(38,0)) * sx_a * (n_a * syy_a - CAST(sy_a AS DECIMAL(38,0)) * sy_a) " +
          "- 2 * CAST(sy_a AS DECIMAL(38,0)) * sx_a * (n_a * sxy_a - CAST(sx_a AS DECIMAL(38,0)) * sy_a) " +
          "+ CAST(sy_a AS DECIMAL(38,0)) * sy_a * (n_a * sxx_a - CAST(sx_a AS DECIMAL(38,0)) * sx_a)"))
      .withColumn("__n1b", expr(
        "CAST(sx_b AS DECIMAL(38,0)) * sx_b * (n_b * syy_b - CAST(sy_b AS DECIMAL(38,0)) * sy_b) " +
          "- 2 * CAST(sy_b AS DECIMAL(38,0)) * sx_b * (n_b * sxy_b - CAST(sx_b AS DECIMAL(38,0)) * sy_b) " +
          "+ CAST(sy_b AS DECIMAL(38,0)) * sy_b * (n_b * sxx_b - CAST(sx_b AS DECIMAL(38,0)) * sx_b)"))
      .withColumn("__va", expr(s"CASE WHEN $guard THEN $raise" +
        s"${reachGuard("a")}ELSE " +
        "((1000000 * __n1a) div (CAST(sx_a AS DECIMAL(38,0)) * sx_a)) " +
        "div (CAST(sx_a AS DECIMAL(38,0)) * sx_a * (n_a - 1)) END"))
      .withColumn("__vb", expr(s"CASE WHEN $guard THEN $raise" +
        s"${reachGuard("b")}ELSE " +
        "((1000000 * __n1b) div (CAST(sx_b AS DECIMAL(38,0)) * sx_b)) " +
        "div (CAST(sx_b AS DECIMAL(38,0)) * sx_b * (n_b - 1)) END"))
      .withColumn("__dm", expr(s"CASE WHEN $guard THEN ${raise}ELSE " +
        "(1000 * (CAST(sy_b AS DECIMAL(38,0)) * sx_a - CAST(sy_a AS DECIMAL(38,0)) * sx_b)) " +
        "div (CAST(sx_a AS DECIMAL(38,0)) * sx_b) END"))
    j.select(
      expr(s"CASE WHEN $guard THEN ${raise}ELSE CAST(n_a AS BIGINT) END").as("n_a"),
      expr(s"CASE WHEN $guard THEN ${raise}ELSE CAST(n_b AS BIGINT) END").as("n_b"),
      expr(s"CASE WHEN $guard THEN ${raise}ELSE " +
        "CAST((1000 * CAST(sy_a AS DECIMAL(38,0))) div sx_a AS BIGINT) END")
        .as("ratio_a_milli"),
      expr(s"CASE WHEN $guard THEN ${raise}ELSE " +
        "CAST((1000 * CAST(sy_b AS DECIMAL(38,0))) div sx_b AS BIGINT) END")
        .as("ratio_b_milli"),
      expr("CAST(__dm AS BIGINT)").as("delta_milli"),
      expr("CAST(__va AS BIGINT)").as("var_a_micro"),
      expr("CAST(__vb AS BIGINT)").as("var_b_micro"),
      expr(s"1000000 * CAST(__dm AS DECIMAL(38,0)) * __dm >= " +
        s"$SrmChi2CritMicro * (CAST(__va AS DECIMAL(38,0)) + __vb)")
        .as("significant"))
  }

  /** Winsorized mean lift — the robust readout for whale-skewed value
    * metrics: a handful of extreme units dominates a raw mean comparison
    * (one lottery-sized purchase flips the sign), so cap every value at
    * the POOLED p-th percentile and compare capped means. Winsorizing
    * (clamp) beats trimming (drop) for lifts because it keeps n and the
    * unit population identical across arms — only the tail mass moves.
    *
    * The cap is the exact pooled order statistic via [[GlobalRank.byValue]]
    * (no single-partition window; the value AT a rank is tie-permutation
    * invariant), broadcast as a 1-row frame; means and lifts are integer
    * milli/permille with cross-multiplied single truncations. Output one
    * row: n_a, n_b, cap_value, mean_a_milli, mean_b_milli,
    * raw_lift_permille, winsorized_lift_permille.
    */
  def winsorizedLift(df: DataFrame, unitCol: String, tieCol: String,
                     value: Column, salt: String,
                     capPermille: Long = 950L): DataFrame = {
    require(capPermille >= 500L && capPermille < 1000L,
      "winsorizedLift: capPermille must be in [500, 1000)")
    val scored = df.select(arm(col(unitCol), salt).as("__arm"),
      value.cast("long").as("v"), col(tieCol).as("__tie"))
    val (ranked, n) = GlobalRank.byValue(
      scored.select(col("v"), col("__tie")), "v", "__tie", "__r")
    require(n >= 2, "winsorizedLift: need at least 2 values")
    val rCap = (capPermille * n + 999L) / 1000L
    val capFrame = ranked.filter(col("__r") === rCap)
      .select(col("v").as("cap_value"))
    scored.crossJoin(broadcast(capFrame))
      .withColumn("__w", least(col("v"), col("cap_value")))
      .agg(
        max(col("cap_value")).as("cap_value"),
        sum(when(col("__arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__arm") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__arm") === 0L, col("v")).otherwise(lit(0L))).as("__ra"),
        sum(when(col("__arm") === 1L, col("v")).otherwise(lit(0L))).as("__rb"),
        sum(when(col("__arm") === 0L, col("__w")).otherwise(lit(0L))).as("__wa"),
        sum(when(col("__arm") === 1L, col("__w")).otherwise(lit(0L))).as("__wb"))
      .select(col("n_a"), col("n_b"), col("cap_value"),
        expr("CASE WHEN n_a = 0 OR n_b = 0 THEN " +
          "raise_error('winsorizedLift: empty arm') " +
          "ELSE (1000L * __wa) div n_a END").as("mean_a_milli"),
        expr("CASE WHEN n_a = 0 OR n_b = 0 THEN " +
          "raise_error('winsorizedLift: empty arm') " +
          "ELSE (1000L * __wb) div n_b END").as("mean_b_milli"),
        expr("CASE WHEN n_a = 0 OR n_b = 0 OR __ra = 0 THEN " +
          "raise_error('winsorizedLift: empty arm or zero arm-A raw sum') " +
          "ELSE (1000L * (CAST(__rb AS DECIMAL(38,0)) * n_a - " +
          "CAST(__ra AS DECIMAL(38,0)) * n_b)) div " +
          "(CAST(__ra AS DECIMAL(38,0)) * n_b) END").as("raw_lift_permille"),
        expr("CASE WHEN n_a = 0 OR n_b = 0 OR __wa = 0 THEN " +
          "raise_error('winsorizedLift: empty arm or zero arm-A capped sum') " +
          "ELSE (1000L * (CAST(__wb AS DECIMAL(38,0)) * n_a - " +
          "CAST(__wa AS DECIMAL(38,0)) * n_b)) div " +
          "(CAST(__wa AS DECIMAL(38,0)) * n_b) END")
          .as("winsorized_lift_permille"))
  }

  /** Two-proportion power constant (z_{0.975} + z_{0.80})² in micro —
    * frozen literal (erf bisection at definition time; 1.959964 and
    * 0.841621 are the standard table anchors). */
  val PowerK80Micro: Long = 7848880L

  /** Power / minimum-detectable-effect check — the question every
    * experiment readout should open with: "at this n, COULD we even see
    * the lift we care about?" An underpowered flat readout is not
    * evidence of no effect. Two-proportion MDE at α = 5%, power = 80%:
    *   MDE² = K · p(1−p) · (1/n_a + 1/n_b),   K = (z_{α/2} + z_β)²,
    * kept SQRT-FREE end to end: the readout is MDE² in permille²
    * (with p the pooled conversion in permille), and the verdict
    * squares the target —
    *   powered ⇔ target² ≥ mde2.
    * All integer: mde2_permille2 = (K_micro · p‰ · (1000 − p‰) ·
    * (n_a + n_b)) div (10⁶ · n_a · n_b). No libm, no float, both
    * engines replay the same literals.
    *
    * Scale: one distinct-unit conditional aggregation — the same
    * single-pass shape as [[srmConversionCheck]]; 1-row output:
    * n_a, n_b, conv_pooled_permille, mde2_permille2,
    * target_lift_permille, powered. Degenerate conversion (p = 0 or
    * p = 1000: zero variance, MDE 0, "powered" vacuously) raises
    * loudly instead — a gate that cannot fail is theater.
    */
  def powerCheck(events: DataFrame, unitCol: String, convWhen: Column,
                 salt: String, targetLiftPermille: Long): DataFrame = {
    require(targetLiftPermille >= 1L && targetLiftPermille <= 1000L,
      "powerCheck: targetLiftPermille must be in [1, 1000]")
    val units = events
      .select(col(unitCol).as("u"),
        when(convWhen, 1L).otherwise(0L).as("__c"))
      .groupBy(col("u"))
      .agg(max(col("__c")).as("converted"))
      .withColumn("arm", arm(col("u"), salt))
    val g = units.agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(col("converted")).as("__conv"))
    val guard = "COALESCE(n_a, 0) = 0 OR COALESCE(n_b, 0) = 0"
    val raise = "raise_error('powerCheck: both arms need at least one unit') "
    g.withColumn("__pm", expr(s"CASE WHEN $guard THEN $raise" +
        "ELSE (1000L * __conv) div (n_a + n_b) END"))
      .select(
        expr(s"CASE WHEN $guard THEN ${raise}ELSE n_a END").as("n_a"),
        expr(s"CASE WHEN $guard THEN ${raise}ELSE n_b END").as("n_b"),
        expr("CASE WHEN __pm = 0 OR __pm = 1000 THEN " +
          "raise_error('powerCheck: degenerate pooled conversion (0 or " +
          "1000 permille) — zero-variance MDE is theater') " +
          "ELSE __pm END").as("conv_pooled_permille"),
        expr(s"CASE WHEN __pm = 0 OR __pm = 1000 THEN " +
          "raise_error('powerCheck: degenerate pooled conversion (0 or " +
          "1000 permille) — zero-variance MDE is theater') " +
          // 38-digit products: K·p·(1000−p)·(n_a+n_b) passes 9.2e18 (long
          // range) already at ~1e9 units
          s"ELSE CAST((CAST($PowerK80Micro AS DECIMAL(38,0)) * __pm * " +
          "(1000 - __pm) * (n_a + n_b)) " +
          "div (CAST(1000000 AS DECIMAL(38,0)) * n_a * n_b) AS BIGINT) END")
          .as("mde2_permille2"))
      .withColumn("target_lift_permille", lit(targetLiftPermille))
      .withColumn("powered",
        lit(targetLiftPermille * targetLiftPermille) >= col("mde2_permille2"))
  }

  /** O'Brien–Fleming two-look boundary z² in micro — frozen literals,
    * derived at definition time by bivariate-normal integration
    * (conditional decomposition + Simpson over erf; corr = √(t₁/t₂) =
    * √½): P(|Z₁| < c√2, |Z₂| < c) = 0.95 gives c = 1.977431 — matching
    * the published OBF K=2 table (2.797/1.977). Interim boundary is
    * 2c² (the √2-inflated interim z, squared). */
  val ObfInterimZ2Micro: Long = 7820466L
  val ObfFinalZ2Micro: Long = 3910233L

  /** Sequential two-look guardrail — the PEEKING discipline: reading a
    * 5%-threshold test twice inflates the family false-alarm rate to
    * ~8%, so a readout that is checked mid-experiment MUST spend its α
    * across looks. O'Brien–Fleming spends almost nothing early (interim
    * boundary z²·2 — only a blatant effect stops the experiment at half
    * time) and keeps the final look near-nominal (3.910 vs 3.841 χ²).
    *
    * The two-proportion z² at each look, all integer:
    *   z² = D²·n / (n_a·n_b·c·(n−c)),  D = c_a·n_b − c_b·n_a,
    * carried micro with one truncating division; verdicts compare
    * against the frozen boundary literals. D² needs ~4·log₁₀(n) digits —
    * a loud guard refuses past 3×10⁹ units (D² would pass 38 digits)
    * rather than wrapping.
    *
    * Look 1 = events in the first time half (the Drift midpoint idiom),
    * look 2 = everything; units keyed by md5 arm. One row per look:
    * (look, n_a, n_b, conv_a, conv_b, z2_micro, boundary_z2_micro,
    * reject). Degenerate looks (zero or all conversions) raise loudly.
    */
  def twoLookGuard(events: DataFrame, unitCol: String, convWhen: Column,
                   tsCol: String, salt: String): DataFrame = {
    val bounds = events.agg(
      min(unix_micros(col(tsCol))).as("__mn"),
      max(unix_micros(col(tsCol))).as("__mx"))
      .select(expr("(__mn + __mx) div 2").as("__mid"))
    val base = events.crossJoin(broadcast(bounds))
    def look(lookNo: Int, withinLook: Column, boundary: Long): DataFrame = {
      val units = base.filter(withinLook)
        .select(col(unitCol).as("u"),
          when(convWhen, 1L).otherwise(0L).as("__c"))
        .groupBy(col("u"))
        .agg(max(col("__c")).as("converted"))
        .withColumn("arm", arm(col("u"), salt))
      val g = units.agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 0L, col("converted")).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") === 1L, col("converted")).otherwise(0L)).as("conv_b"))
      val guard = "COALESCE(n_a, 0) = 0 OR COALESCE(n_b, 0) = 0 " +
        "OR conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b"
      val raise = "raise_error('twoLookGuard: degenerate look — both arms " +
        "need units and conversions must be strictly between 0 and n') "
      val sizeGuard = "n_a + n_b > 3000000000"
      val sizeRaise = "raise_error('twoLookGuard: past 3e9 units D^2 " +
        "escapes 38-digit decimals — shard the z computation first') "
      g.withColumn("__z2", expr(s"CASE WHEN $guard THEN $raise" +
          s"WHEN $sizeGuard THEN $sizeRaise ELSE " +
          "CAST((1000000 * CAST(conv_a * n_b - conv_b * n_a AS DECIMAL(38,0)) " +
          "* (conv_a * n_b - conv_b * n_a) * (n_a + n_b)) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b * (conv_a + conv_b) * " +
          "(n_a + n_b - conv_a - conv_b)) AS BIGINT) END"))
        .select(lit(lookNo.toLong).as("look"), col("n_a"), col("n_b"),
          col("conv_a"), col("conv_b"), col("__z2").as("z2_micro"),
          lit(boundary).as("boundary_z2_micro"),
          (col("__z2") > boundary).as("reject"))
    }
    look(1, unix_micros(col(tsCol)) < col("__mid"), ObfInterimZ2Micro)
      .unionByName(look(2, lit(true), ObfFinalZ2Micro))
  }

  /** Uniformity audit of the hash bucketing ITSELF — the meta-check under
    * every md5-derived split in this repo (experiment arms, conformal
    * halves, doc samples, rendezvous shards): Pearson χ² of distinct-unit
    * counts across 16 buckets against the uniform expectation, exact to
    * the last digit via the cross-multiplied form
    *   χ² = Σ(k·o_i − n)² / (k·n)
    * (micro, one truncating division), judged against the frozen χ²₁₅
    * 5% critical value. Empty buckets are filled explicitly (a missing
    * group must count as o = 0, not vanish). One distinct pass + a
    * 16-row aggregate.
    */
  def hashUniformityAudit(df: DataFrame, unitCol: String, salt: String,
                          buckets: Int = 16): DataFrame = {
    require(buckets == 16,
      "hashUniformityAudit is calibrated for 16 buckets (χ²₁₅ critical value)")
    val spark = df.sparkSession
    import spark.implicits._
    val bc = df.select(col(unitCol).as("u")).distinct()
      .select(arm(col("u"), salt, buckets).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("o"))
    val full = (0 until buckets).map(_.toLong).toDF("b")
      .join(bc, Seq("b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val tot = full.agg(sum(col("o")).as("n"))
    full.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n_units"),
        count(lit(1)).as("n_buckets"),
        min(col("o")).as("min_bucket"),
        max(col("o")).as("max_bucket"),
        sum(expr(s"CAST($buckets * o - n AS DECIMAL(38,0)) * ($buckets * o - n)"))
          .as("__ss"))
      .select(col("n_units"), col("n_buckets"), col("min_bucket"),
        col("max_bucket"),
        expr(s"(1000000 * __ss) div (CAST($buckets AS DECIMAL(38,0)) * n_units)")
          .as("chi2_micro"))
      .withColumn("uniform_ok", col("chi2_micro") <= Chi2Crit15Micro)
  }

  /** Post-stratified lift — CUPED's categorical sibling (the estimator
    * survey texts call post-stratification): within each pre-treatment
    * stratum the arms are compared on their own means, and the per-stratum
    * differences are recombined weighted by the stratum's population share
    *   Δ_ps = Σ_s (n_s/N) · (ȳ_sb − ȳ_sa)
    * — removing the between-strata share of the variance exactly as CUPED
    * removes the covariate's linear share, but with no linearity
    * assumption (any categorical covariate works: platform, country,
    * activity tier).
    *
    * Exactness: per-stratum arm sums via ONE keyed conditional
    * aggregation; each stratum's term is carried cross-multiplied in
    * DECIMAL(38,0) and truncated ONCE to milli —
    *   term_milli(s) = (1000·n_s·(sy_sb·n_sa − sy_sa·n_sb)) div (N·n_sa·n_sb)
    * — then summed (per-stratum truncation order is well-defined, so both
    * engines replay it bit-for-bit). A stratum with an EMPTY arm makes the
    * estimator undefined and refuses loudly (collapse strata first — the
    * usual remedy — rather than silently dropping the stratum's units).
    *
    * Input: per-unit frame (arm ∈ {0,1}, stratum, y). One-row output:
    * n_units, n_strata, raw_lift_milli, poststrat_lift_milli.
    */
  def postStratifiedLift(perUnit: DataFrame): DataFrame = {
    val byStratum = perUnit.groupBy(col("stratum")).agg(
      count(lit(1)).as("n_s"),
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_sa"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_sb"),
      sum(when(col("arm") === 0L, col("y")).otherwise(lit(0L))).as("sy_sa"),
      sum(when(col("arm") === 1L, col("y")).otherwise(lit(0L))).as("sy_sb"))
    // r16 (guide §2.4, the ddsketch-totals precedent): N rides the stratum
    // frame as a full-frame window sum (one single-partition pass over the
    // answer-sized strata — bounded by the stratum count, the operator's
    // documented model), so the per-stratum milli terms and every grand
    // total come from ONE execution of the stratum subtree and ONE final
    // aggregation. The r15 shape executed the stratum aggregation three
    // times (totals, terms×broadcast-N, final assembly).
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val tot = byStratum
      .withColumn("__N", sum(col("n_s")).over(wAll))
      .agg(
        sum(col("n_s")).as("n"),
        count(lit(1)).as("n_strata"),
        sum(col("n_sa")).as("n_a"), sum(col("n_sb")).as("n_b"),
        sum(col("sy_sa")).as("sy_a"), sum(col("sy_sb")).as("sy_b"),
        min(least(col("n_sa"), col("n_sb"))).as("__min_arm"),
        sum(expr(
          """CASE WHEN n_sa = 0 OR n_sb = 0 THEN NULL ELSE
             (1000 * CAST(n_s AS DECIMAL(38,0)) *
               (CAST(sy_sb AS DECIMAL(38,0)) * n_sa -
                CAST(sy_sa AS DECIMAL(38,0)) * n_sb)) div
             (CAST(__N AS DECIMAL(38,0)) * n_sa * n_sb) END"""))
          .as("__ps"))
    val emptyArm = "__min_arm = 0"
    tot.select(
      expr(s"CASE WHEN $emptyArm THEN raise_error('postStratifiedLift: a " +
        "stratum has an empty arm — collapse strata before estimating') " +
        "ELSE CAST(n AS BIGINT) END").as("n_units"),
      expr(s"CASE WHEN $emptyArm THEN raise_error('postStratifiedLift: a " +
        "stratum has an empty arm — collapse strata before estimating') " +
        "ELSE CAST(n_strata AS BIGINT) END").as("n_strata"),
      expr(s"CASE WHEN $emptyArm THEN raise_error('postStratifiedLift: a " +
        "stratum has an empty arm — collapse strata before estimating') " +
        "ELSE CAST((1000 * (CAST(sy_b AS DECIMAL(38,0)) * n_a - " +
        "CAST(sy_a AS DECIMAL(38,0)) * n_b)) div " +
        "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) END")
        .as("raw_lift_milli"),
      expr(s"CASE WHEN $emptyArm THEN raise_error('postStratifiedLift: a " +
        "stratum has an empty arm — collapse strata before estimating') " +
        "ELSE CAST(__ps AS BIGINT) END").as("poststrat_lift_milli"))
  }

  /** Cluster-randomized lift — the analysis a CLUSTER-randomized rollout
    * needs (assignment by domain / household / geo, not by unit): the
    * per-unit "naive" lift is reported beside the cluster-mean lift, whose
    * analysis unit matches the randomization unit. When cluster size
    * correlates with outcome the two diverge — exactly the bias the
    * cluster-mean estimator exists to avoid; equal-weighting clusters is
    * the standard first-line estimator (Donner & Klar).
    *
    * Exactness: per-cluster means truncate ONCE to milli
    * (cm_c = (1000·sy_c) div n_c), then each arm averages those integers
    * with one more truncating division — a documented, engine-replayable
    * two-step truncation (exact rational averaging would need a common
    * denominator over all clusters). Arms with zero clusters refuse
    * loudly. Input: per-unit frame (cluster, arm ∈ {0,1} CONSTANT within
    * cluster, y); the within-cluster-constant contract is asserted: any
    * cluster seen with both arms raises.
    *
    * One-row output: n_clusters_a, n_clusters_b, n_units,
    * unit_lift_milli, clustermean_lift_milli.
    */
  def clusterRandomizedLift(perUnit: DataFrame): DataFrame = {
    val byCluster = perUnit.groupBy(col("cluster")).agg(
      count(lit(1)).as("n_c"),
      sum(col("y")).as("sy_c"),
      min(col("arm")).as("arm"),
      countDistinct(col("arm")).as("__arms"))
    val g = byCluster
      .withColumn("cm_milli", expr(
        // contract guard INSIDE the consumed column: a cluster spanning
        // arms means the assignment was not cluster-randomized at all
        """CASE WHEN __arms > 1 THEN raise_error(CONCAT(
             'clusterRandomizedLift: cluster ', CAST(cluster AS STRING),
             ' spans both arms — assignment is not cluster-randomized'))
           ELSE (1000 * CAST(sy_c AS DECIMAL(38,0))) div n_c END"""))
      .agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("k_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("k_b"),
        sum(col("n_c")).as("n"),
        sum(when(col("arm") === 0L, col("n_c")).otherwise(lit(0L))).as("n_a"),
        sum(when(col("arm") === 1L, col("n_c")).otherwise(lit(0L))).as("n_b"),
        sum(when(col("arm") === 0L, col("sy_c")).otherwise(lit(0L))).as("sy_a"),
        sum(when(col("arm") === 1L, col("sy_c")).otherwise(lit(0L))).as("sy_b"),
        sum(when(col("arm") === 0L, col("cm_milli")).otherwise(lit(0L)))
          .as("scm_a"),
        sum(when(col("arm") === 1L, col("cm_milli")).otherwise(lit(0L)))
          .as("scm_b"))
    val emptyArm = "k_a = 0 OR k_b = 0"
    g.select(
      expr(s"CASE WHEN $emptyArm THEN raise_error('clusterRandomizedLift: " +
        "an arm has zero clusters') ELSE CAST(k_a AS BIGINT) END")
        .as("n_clusters_a"),
      expr(s"CASE WHEN $emptyArm THEN raise_error('clusterRandomizedLift: " +
        "an arm has zero clusters') ELSE CAST(k_b AS BIGINT) END")
        .as("n_clusters_b"),
      expr(s"CASE WHEN $emptyArm THEN raise_error('clusterRandomizedLift: " +
        "an arm has zero clusters') ELSE CAST(n AS BIGINT) END")
        .as("n_units"),
      expr(s"CASE WHEN $emptyArm THEN raise_error('clusterRandomizedLift: " +
        "an arm has zero clusters') ELSE " +
        "CAST((1000 * (CAST(sy_b AS DECIMAL(38,0)) * n_a - " +
        "CAST(sy_a AS DECIMAL(38,0)) * n_b)) div " +
        "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) END")
        .as("unit_lift_milli"),
      expr(s"CASE WHEN $emptyArm THEN raise_error('clusterRandomizedLift: " +
        "an arm has zero clusters') ELSE " +
        "CAST(scm_b div k_b - scm_a div k_a AS BIGINT) END")
        .as("clustermean_lift_milli"))
  }
}
