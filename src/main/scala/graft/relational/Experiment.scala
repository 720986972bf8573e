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
}
