package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benford first-digit audit (Newcomb 1881 / Benford 1938) — the classic
  * fabricated-data screen: organically-grown magnitudes (prices, counts,
  * file sizes) put digit d first with probability log₁₀(1+1/d); uniform
  * generators, copy-paste and capped fields do not. The audit compares the
  * observed first-digit mix against the published distribution and reports
  * signed deviations.
  *
  * Exactness: the expected distribution enters as the standard integer
  * PERMILLE table (301, 176, 125, 97, 79, 67, 58, 51, 46 — rounding of
  * log₁₀(1+1/d), summing to 1000), so no logarithm is evaluated anywhere;
  * first digits come from the decimal string form (no float division);
  * shares are truncating-division permille. The verdict statistic is the
  * integer L1 distance Σ|obs − exp| — at the usual screening threshold
  * (L1 ≳ 150‰ warrants a look) the χ² refinement adds nothing a permille
  * table hasn't already said.
  *
  * Scale: one map-side-combined 9-group aggregation over the scan; the
  * expected table is a 9-row broadcast, totals a 1-row broadcast.
  */
object Benford {

  private val expectedPermille =
    Seq(1 -> 301L, 2 -> 176L, 3 -> 125L, 4 -> 97L, 5 -> 79L, 6 -> 67L,
      7 -> 58L, 8 -> 51L, 9 -> 46L)

  /** (digit 1..9, n, obs_permille, exp_permille, dev_permille,
    * l1_permille) — `valueExpr` must be a positive integer-valued column
    * (pre-scale currency to cents first); zero/negative/null rows are
    * excluded from the audit (they have no Benford first digit), their
    * count is the caller's own DQ rule.
    */
  def firstDigitAudit(df: DataFrame, valueExpr: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the only scan-heavy stage; lands so the three downstream consumers
    // (totals, L1, output rows) read 9 rows instead of re-scanning
    val digits = Stages.materialize(
      df.select(valueExpr.cast("long").as("__v"))
        .filter(col("__v") > 0)
        .select(substring(col("__v").cast("string"), 1, 1).cast("long")
          .as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n")), "benford_digits")
    val exp = broadcast(expectedPermille.toDF("digit", "exp_permille")
      .select(col("digit").cast("long").as("digit"), col("exp_permille")))
    // right join: a digit absent from the data still gets its audit row
    // (n = 0, deviation = −expected) — absence IS the signal for d=1
    val joined = digits.join(exp, Seq("digit"), "right")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        col("exp_permille"))
    val tot = joined.agg(sum(col("n")).as("__t"))
    val scored = joined.crossJoin(broadcast(tot))
      .withColumn("obs_permille", expr("(1000L * n) div __t"))
      .withColumn("dev_permille", col("obs_permille") - col("exp_permille"))
    val l1 = scored.agg(sum(abs(col("dev_permille"))).as("l1_permille"))
    scored.crossJoin(broadcast(l1))
      .select(col("digit"), col("n"), col("obs_permille"),
        col("exp_permille"), col("dev_permille"), col("l1_permille"))
  }
}
