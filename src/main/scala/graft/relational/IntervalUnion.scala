package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key union of fixed-length time intervals — the classic sweep-line
  * "merge overlapping intervals" made window-expressible: an interval opens
  * a NEW segment exactly when its start lies past the maximum end seen so
  * far in that key (strictly-preceding running max), and the segment id is
  * the running count of such openings. Within one merged segment the union
  * length is just max(end) − min(start) because the segment is connected
  * by construction. The operational read: "how many minutes was this user
  * actually active?" — the session-coverage question answered without a
  * gap parameter (the interval length IS the activity halo).
  *
  * Exactness: all arithmetic on truncated epoch seconds (floor(epoch) on
  * both engines — the house rule from rate_limit_audit); segment ids,
  * durations and permille shares are integers end-to-end.
  *
  * Scale: both windows partition by the key (no global ordering anywhere);
  * the per-segment and per-key rollups are keyed aggregations with
  * map-side combine. Ties on equal starts are order-insensitive: an
  * equal-start row can never open a segment after its twin closed one
  * (both compare against the same preceding maximum, and a twin's end
  * only RAISES the running max).
  */
object IntervalUnion {

  /** (key, n_events, n_segments, covered_sec, span_sec, covered_permille)
    * from per-row instants of `df`: each row contributes the interval
    * [sec, sec + lenSec). covered_permille = 1000·covered div span —
    * how much of the key's first-to-last footprint is actually covered.
    */
  def coverage(df: DataFrame, keyCol: String, tsCol: String,
               lenSec: Long): DataFrame = {
    require(lenSec > 0, s"interval length must be positive, got $lenSec")
    val key = col(keyCol)
    val base = df.select(key,
      expr(s"unix_micros($tsCol) div 1000000").as("__s"))
      .withColumn("__e", col("__s") + lenSec)
    val order = Window.partitionBy(key).orderBy(col("__s"), col("__e"))
    val segmented = base
      .withColumn("__pm", max(col("__e")).over(
        order.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pm").isNull || col("__s") > col("__pm"), 1L).otherwise(0L))
      .withColumn("__seg", sum(col("__new")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    segmented
      .groupBy(key, col("__seg"))
      .agg(count(lit(1)).as("__n"),
        min(col("__s")).as("__a"), max(col("__e")).as("__b"))
      .groupBy(key)
      .agg(sum(col("__n")).as("n_events"),
        count(lit(1)).as("n_segments"),
        sum(col("__b") - col("__a")).as("covered_sec"),
        (max(col("__b")) - min(col("__a"))).as("span_sec"))
      .withColumn("covered_permille",
        expr("(1000L * covered_sec) div span_sec"))
  }
}
