package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sliding-window burst/rate audit — the bot/abuse data-quality gate run
  * before user events become training signal: for each key, the maximum
  * event count inside ANY trailing window of `windowSec`, and a verdict
  * against a rate limit. A key whose peak rate is super-human is scripted
  * traffic; its events poison engagement-derived labels.
  *
  * Exact, no approximation: the trailing count rides a per-key RANGE
  * window over epoch seconds (micro-batch replays and engines agree on
  * integer second bounds). The window is PARTITIONED by key — no global
  * sort; per-key event counts are the kNN-degree-like bound that keeps
  * frames proportional to the data.
  */
object RateAudit {

  /** Per-key peak trailing-window rate: (key, n_events, peak_in_window,
    * limited) where peak_in_window = max over events of the count in
    * (t − windowSec, t], and limited = peak > maxPerWindow.
    */
  def peakRates(df: DataFrame, keyCol: String, tsCol: String,
                windowSec: Long, maxPerWindow: Long): DataFrame = {
    require(windowSec > 0 && maxPerWindow > 0)
    require(df.schema(tsCol).dataType ==
      org.apache.spark.sql.types.TimestampType,
      "rate audit needs a TIMESTAMP column (integer-second range window)")
    val w = Window.partitionBy(col("__k")).orderBy(col("__sec"))
      .rangeBetween(-(windowSec - 1), Window.currentRow)
    df.select(col(keyCol).as("__k"),
      col(tsCol).cast("long").as("__sec"))
      .withColumn("__inwin", count(lit(1)).over(w))
      .groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).as("n_events"),
        max(col("__inwin")).as("peak_in_window"))
      .withColumn("limited", col("peak_in_window") > maxPerWindow)
  }
}
