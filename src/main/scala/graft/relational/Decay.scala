package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Power-of-two half-life decay scores — the feature-store "time-decayed
  * engagement" aggregate (recency-weighted activity per key) in exact
  * integer arithmetic: a contribution loses one BIT per elapsed half-life,
  * weight 2^−⌊age/halfLife⌋, so the decayed sum is Σ cents div 2^k — no
  * exp(), no float weights, engine-identical to the digit. The usual
  * e^−λΔt form differs only by the smoothness of the curve; the operating
  * decision (recent keys outrank stale ones at equal volume) is the same,
  * and this one replays exactly.
  *
  * Scale: one projection against a 1-row max-date broadcast, one
  * map-side-combined aggregation per key. The shift exponent clamps at 62
  * (beyond that a BIGINT contribution is zero anyway) — without the clamp
  * a >434-year age would hit Java's mod-64 shift wraparound and RESURRECT
  * old activity.
  */
object Decay {

  /** (key, n_events, raw_cents, decayed_cents) per `keyCol`; `valueCol`
    * must be a 2-decimal currency-like column (cast through DECIMAL(12,2)
    * so cents are exact).
    */
  def halfLifeScores(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, "halfLifeDays must be >= 1")
    val base = df.select(col(keyCol),
      to_date(col(tsCol)).as("__d"),
      expr(s"CAST(CAST($valueCol AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("__cents"))
    val maxd = base.agg(max(col("__d")).as("__mx"))
    base.crossJoin(broadcast(maxd))
      .withColumn("__k",
        least(expr(s"CAST(datediff(__mx, __d) AS BIGINT) div $halfLifeDays"),
          lit(62L)))
      .withColumn("__dec",
        expr("__cents div shiftleft(1L, CAST(__k AS INT))"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__cents")).as("raw_cents"),
        sum(col("__dec")).as("decayed_cents"))
  }
}
