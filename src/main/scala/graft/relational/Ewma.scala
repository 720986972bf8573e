package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dyadic EWMA control chart — exponential smoothing and its residual
  * alarm as EXACT integer arithmetic, engine-replayable digit for digit.
  *
  * The classical EWMA s_t = λ·x_t + (1−λ)·s_{t−1} is a recurrence no
  * window function expresses and no float replay hashes identically. At
  * λ = 1/2 it has a DYADIC closed form: with s_1 = x_1,
  *   2^(t−1) · s_t = x_1 + Σ_{i=2..t} x_i · 2^(i−2)  =: S_t,
  * an ordinary weighted cumulative sum with power-of-two weights — one
  * per-key ordered window, shiftleft arithmetic in both engines (never a
  * float pow), and ONE truncating division at read-out:
  *   ewma_milli  = (1000·S_t)  div 2^(t−1).
  * The residual of the new point against the PRIOR smooth is exact too:
  *   (x_t − s_{t−1})/s_{t−1} = (x_t·2^(t−2) − S_{t−1}) / S_{t−1},
  * reported in permille with a threshold alarm — the control-chart read
  * (Roberts 1959; NIST/SEMATECH §6.3.2.4) on counting series.
  *
  * Bounds, loudly: weights reach 2^(t−2), so series longer than 55 points
  * per key would overflow the dyadic scale — `assert_true` fails the job
  * rather than wrapping (re-window longer series: chart weeks, not days).
  * Sums are DECIMAL(38,0) / HUGEINT.
  *
  * Scale shape: the input is an already-aggregated per-(key, period)
  * frame (answer-sized); the chart is one partitioned window over it —
  * no corpus pass, no single-partition window.
  */
object Ewma {

  /** Per-row chart over an aggregated series: input (keyCols..., orderCol,
    * valueCol) → + seq, ewma_milli, dev_permille, alarm. seq=1 rows have
    * no prior smooth — dev_permille 0 and alarm false by convention (a
    * first observation cannot deviate from its own baseline).
    */
  def dyadicChart(series: DataFrame, keyCols: Seq[String], orderCol: String,
                  valueCol: String, alarmPermille: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val cumW = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    series
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("__wt", when(col("seq") === 1L, 1L)
        .otherwise(expr("shiftleft(1L, CAST(seq - 2 AS INT))")))
      .withColumn("__S", sum(expr(
        s"CAST($valueCol AS DECIMAL(38,0)) * __wt")).over(cumW))
      .withColumn("__Sp", lag(col("__S"), 1).over(w))
      // the guard lives INSIDE the output expression (a dropped assert_true
      // column is pruned by Catalyst and never evaluates — observed): any
      // consumer touching the chart past 55 points raises before a wrapped
      // shiftleft weight can reach a result
      .withColumn("ewma_milli", when(col("seq") > 55L,
          expr("raise_error('ewma: series longer than 55 points per key — " +
            "dyadic weights overflow the exact scale; re-window the series')")
            .cast("long"))
        .otherwise(expr("(1000 * __S) div shiftleft(1L, CAST(seq - 1 AS INT))")))
      // same guard on the residual branch: a consumer selecting ONLY
      // dev_permille/alarm prunes ewma_milli (and its guard) away, so the
      // raise must ride every output column that reads a dyadic weight
      .withColumn("dev_permille", when(col("seq") > 55L,
          expr("raise_error('ewma: series longer than 55 points per key — " +
            "dyadic weights overflow the exact scale; re-window the series')")
            .cast("long"))
        .when(col("seq") === 1L, 0L)
        .otherwise(expr(
          s"(1000 * (CAST($valueCol AS DECIMAL(38,0)) * __wt - __Sp)) div __Sp")))
      .withColumn("alarm",
        col("seq") =!= 1L && abs(col("dev_permille")) > lit(alarmPermille))
      .drop("__guard", "__wt", "__S", "__Sp")
  }
}
