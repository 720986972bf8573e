package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift audit between two halves of a time range — the
  * production data-quality monitor ("did the event mix shift?") in exact
  * integer arithmetic: per-category counts in each half, permille shares by
  * integer division, and the absolute share delta. No KL/PSI logarithms —
  * ln() is not reproducible across engines at the ulp level, while the
  * total-variation-style share delta is integer-exact and carries the same
  * alerting signal.
  *
  * Scale design: one bounds aggregation (1 row, broadcast back), one
  * conditional-aggregation scan producing a category-sized frame, one
  * 1-row totals broadcast. Two passes over the events scan, zero
  * non-broadcast joins, zero windows.
  */
object Drift {

  /** Per-category half-vs-half drift: (category, n_first, n_second,
    * p1_permille, p2_permille, delta_permille). The split point is the
    * integer midpoint of [min ts, max ts] in epoch micros; rows at exactly
    * the midpoint fall into the SECOND half.
    */
  def tvByCategory(df: DataFrame, catCol: String, tsCol: String): DataFrame = {
    require(df.schema(tsCol).dataType ==
      org.apache.spark.sql.types.TimestampType,
      "drift split needs a TIMESTAMP column (unix_micros midpoint math)")
    val bounds = df.agg(
      min(unix_micros(col(tsCol))).as("__mn"),
      max(unix_micros(col(tsCol))).as("__mx"))
      .select(expr("(__mn + __mx) div 2").as("__mid"))
    val halved = df.crossJoin(broadcast(bounds))
      .withColumn("__h1", unix_micros(col(tsCol)) < col("__mid"))
    val perCat = halved.groupBy(col(catCol).as("category"))
      .agg(sum(when(col("__h1"), 1L).otherwise(0L)).as("n_first"),
        sum(when(!col("__h1"), 1L).otherwise(0L)).as("n_second"))
    val totals = perCat.agg(sum("n_first").as("__t1"), sum("n_second").as("__t2"))
    // Degenerate-split guard: with a constant timestamp (min == max) every
    // row lands in the second half and __t1 = 0; an empty category frame
    // gives NULL totals. Either way the integer division would raise
    // DIVIDE_BY_ZERO under ANSI — report a 0 share for an empty half
    // instead of failing the whole audit.
    perCat.crossJoin(broadcast(totals))
      .withColumn("p1_permille",
        when(coalesce(col("__t1"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("(1000L * n_first) div __t1")))
      .withColumn("p2_permille",
        when(coalesce(col("__t2"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("(1000L * n_second) div __t2")))
      .withColumn("delta_permille", abs(col("p1_permille") - col("p2_permille")))
      .drop("__t1", "__t2")
  }
}
