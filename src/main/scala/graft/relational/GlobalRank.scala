package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact global rank by an arbitrary value column WITHOUT a global window —
  * [[PrefixSum]]'s two-phase discipline pointed at ORDER STATISTICS: bucket
  * rows into uniform value-range cells computed from one exact (min, max)
  * aggregate (plan-deterministic, lineage-safe — no sampled
  * RangePartitioner cut points, no checkpoint), count per cell
  * (`numBuckets` scalars to the driver), broadcast exclusive offsets back,
  * and rank only WITHIN cells — so `rank = offset(cell) + row_number` is
  * the exact (value, tie)-order global rank while no task ever sees more
  * than its cell. The single-partition `Window.orderBy(x)` that Spark
  * would otherwise run — the classic quantile/ntile scale killer — never
  * appears in the plan.
  *
  * Contract: `valueCol` numeric non-null (enforced loudly); `tieCol` a
  * unique non-null key (the usual primary key — uniqueness makes the order
  * total, so ranks are reproducible on every recompute). Value skew can
  * unbalance CELL SIZES (all mass in one cell degrades to the global
  * window); `maxCellShare` fails loudly past the documented bound instead
  * of discovering the straggler at hour three.
  */
object GlobalRank {

  /** Adds `outCol` = 1-based exact global rank by (valueCol asc, tieCol
    * asc). Returns the augmented frame and the total row count (the
    * driver already holds the cell counts). */
  def byValue(df: DataFrame, valueCol: String, tieCol: String,
              outCol: String, numBuckets: Int = 64,
              maxCellShare: Int = 4): (DataFrame, Long) = {
    require(numBuckets > 0)
    val bounds = df.agg(
      min(col(valueCol).cast("double")).as("lo"),
      max(col(valueCol).cast("double")).as("hi"),
      count(lit(1)).as("n"),
      count(col(valueCol).cast("double")).as("nn")).head()
    if (bounds.getLong(2) == 0L) return (df.withColumn(outCol, lit(0L)), 0L)
    require(bounds.getLong(3) == bounds.getLong(2),
      s"globalRank: $valueCol must be numeric and non-null — " +
        s"${bounds.getLong(2) - bounds.getLong(3)} of ${bounds.getLong(2)} " +
        "rows cast to null")
    val n = bounds.getLong(2)
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val span = hi - lo + 1.0
    val cell = least(lit(numBuckets - 1),
      floor((col(valueCol).cast("double") - lit(lo)) / lit(span) * numBuckets))
    val withCell = df.withColumn("__cell", cell)
    // numBuckets scalars — the bounded-model-collect class
    val cellCounts = withCell.groupBy(col("__cell"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val biggest = cellCounts.map(_._2).max
    require(biggest * maxCellShare <= math.max(n, numBuckets.toLong) ||
      biggest <= 1000000L,
      s"globalRank: one value cell holds $biggest of $n rows — the value " +
        "distribution is too concentrated for uniform cells; pre-transform " +
        s"the column (rank a log/bucketized view) or raise maxCellShare")
    var acc = 0L
    val offsets = cellCounts.map { case (c, cnt) =>
      val off = (c, acc); acc += cnt; off
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toDF("__cell", "__off"))
    val w = Window.partitionBy(col("__cell"))
      .orderBy(col(valueCol), col(tieCol))
    (withCell.join(offDf, Seq("__cell"))
      .withColumn(outCol, col("__off") + row_number().over(w))
      .drop("__cell", "__off"), n)
  }

  /** DuckDB-convention ntile from an exact 1-based rank: with q = n div k
    * and r = n mod k, the FIRST r tiles hold q+1 rows (verified identical
    * in Spark and DuckDB: ntile(5) over 7 rows tiles as 2,2,1,1,1) —
    * closed-form from the rank, so it composes with [[byValue]] without
    * any window at all. */
  def ntileFromRank(rankCol: String, n: Long, k: Int): Column = {
    require(k >= 1 && n >= 0)
    val q = n / k
    val r = n % k
    // integral `div`, never Column./ — an IEEE double quotient's floor can
    // misbucket once the divisor passes ~5e6 (0.5 ulp at rank ~1e9 beats
    // 1/divisor), which is exactly the n this helper exists for
    expr(s"CASE WHEN $rankCol <= ${r * (q + 1)}L THEN " +
      s"($rankCol - 1L) div ${q + 1}L + 1L " +
      s"ELSE ${r}L + ($rankCol - ${r * (q + 1)}L - 1L) div " +
      s"${math.max(q, 1L)}L + 1L END")
  }
}
