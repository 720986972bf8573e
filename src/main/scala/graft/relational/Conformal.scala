package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal threshold calibration (Vovk's inductive conformal
  * prediction; Angelopoulos & Bates 2023 tutorial form) — the
  * distribution-free way to turn ANY score into a gate with a coverage
  * guarantee: calibrate τ on one half of the data such that ≈ α of
  * calibration scores fall below it, and P(new score < τ) ≤ α holds with
  * no assumption on the score's distribution. The second half AUDITS the
  * guarantee empirically — the row ships the promise and its measurement
  * together.
  *
  * Determinism discipline: the cal/test split is the house md5 arm (no
  * rand — same docs land in the same half in any engine at any scale),
  * and τ is the r-th smallest calibration score with r = ⌊α(n+1)⌋ picked
  * by EXACT global rank ([[GlobalRank.byValue]] — uniform value cells +
  * within-cell windows, no single-partition window and no TakeOrdered of
  * an α·n-row prefix to the driver, which is what a naive
  * orderBy().limit(r) would be at corpus scale).
  */
object Conformal {

  /** One-row frame: n_cal, n_test, alpha_permille, tau,
    * coverage_permille (share of test scores ≥ τ — should land near
    * 1000 − α).
    */
  def splitCoverage(df: DataFrame, idCol: String, score: Column,
                    alphaPermille: Long, salt: String): DataFrame = {
    require(alphaPermille >= 1 && alphaPermille < 1000)
    val scored = df.select(col(idCol).as("id"), score.cast("long").as("s"),
      Experiment.arm(col(idCol), salt).as("__arm"))
    val cal = scored.filter(col("__arm") === 0L)
    val test = scored.filter(col("__arm") === 1L)
    val (ranked, nCal) = GlobalRank.byValue(cal, "s", "id", "__r")
    val r = alphaPermille * (nCal + 1) / 1000
    require(r >= 1,
      s"conformal: alpha=$alphaPermille permille needs at least " +
        s"${1000 / alphaPermille} calibration rows (have $nCal)")
    val tau = ranked.filter(col("__r") === r).select(col("s").as("tau"))
    test.crossJoin(broadcast(tau))
      .agg(count(lit(1)).as("n_test"),
        max(col("tau")).as("tau"),
        sum(when(col("s") >= col("tau"), 1L).otherwise(0L)).as("__ge"))
      .select(lit(nCal).as("n_cal"), col("n_test"),
        lit(alphaPermille).as("alpha_permille"), col("tau"),
        expr("(1000L * __ge) div n_test").as("coverage_permille"))
  }
}
