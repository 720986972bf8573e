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
}
