package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Portable relative-error quantile sketch with its own accuracy audit —
  * the DDSketch idea (Masson, Lee & Rim, VLDB 2019) rebuilt on integer
  * bit arithmetic so the sketch is exactly replayable in any engine: a
  * non-negative long value maps to bucket
  *
  *   v < 16           → key = v                     (exact singletons)
  *   v ≥ 16, e=bits(v) → key = 16·e + (v div 2^(e−5) − 16)
  *
  * i.e. the exponent and the top 4 mantissa bits — `length(bin(v))` is
  * the bit length in BOTH Spark and DuckDB (minimal binary string), so
  * the mapping never touches a float log. Buckets are geometric with 16
  * sub-steps per octave: the bucket's lower bound L ≤ v < L·(1+1/16), so
  * a quantile read back as L UNDERestimates by a bounded relative error
  * < 1/16 ≈ 6.25% — the DDSketch guarantee, traded from configurable α
  * to exact portability. Counts are mergeable by addition (shards /
  * windows / engines), and the whole per-group sketch is ≤ 16·64 cells
  * whatever the data volume.
  *
  * The AUDIT computes the exact lower order statistic beside the sketch
  * read. Exact per-group quantiles need per-group value CDFs — bounded
  * here by a loud distinct-value probe (the QuantileRank contract:
  * integer-like domains only); production at unbounded domains runs the
  * sketch ALONE, which is the point of having it.
  */
object DdSketch {

  /** Per (group, q) audit rows: (group, q_permille, n, sketch_estimate,
    * exact_value, err_permille), group-then-q order. Values must be
    * non-negative longs (cents, seconds, counts — fails loudly on
    * negatives: the geometric mapping has no sign). */
  def quantileAudit(df: DataFrame, groupCol: String, valueCol: String,
                    qsPermille: Seq[Int] = Seq(500, 990),
                    maxDistinct: Int = 200000): DataFrame = {
    require(qsPermille.nonEmpty &&
      qsPermille.forall(q => q >= 1 && q <= 1000),
      s"quantileAudit: quantiles $qsPermille outside 1..1000 permille")
    val spark = df.sparkSession
    val v = col(valueCol).cast("long")
    val base = df.select(col(groupCol).as("g"), v.as("v"))

    // ONE eager guard probe (r15, guide §1.2): the bounded distinct-value
    // probe doubles as the negative check — a negative value is by
    // definition a distinct value, and the domain-size refusal fires FIRST,
    // so the truncated probe can never hide one. The r14 shape ran a
    // separate full-scan limit(1) job just for the sign check.
    val probe = base.select(col("v")).distinct().limit(maxDistinct + 1).collect()
    require(probe.length <= maxDistinct,
      s"quantileAudit: > $maxDistinct distinct values — the exact audit " +
        "side needs a bounded domain (the QuantileRank contract); run the " +
        "sketch without the audit or bucketize first")
    // negatives would silently map to garbage buckets (bin() of a negative
    // long is its two's-complement, 64 chars) — refuse loudly
    require(!probe.exists(r => !r.isNullAt(0) && r.getLong(0) < 0L),
      s"quantileAudit: negative $valueCol — the geometric bucket mapping " +
        "is defined for non-negative values; shift or split the domain")

    val keyed = base.withColumn("k",
      when(col("v") < 16L, col("v"))
        .otherwise(expr(
          "16L * length(bin(v)) + (v div shiftleft(1L, length(bin(v)) - 5) - 16L)")))
    val cells = keyed.groupBy(col("g"), col("k"))
      .agg(count(lit(1)).as("c"))
    // per-group cumulative over the ≤ 16·64-cell sketch — bounded window.
    // The group total rides the SAME window pass as a partition-frame sum
    // (r15, guide §2.4): the r14 shape aggregated `totals` separately and
    // joined it back, which executed the cells subtree twice and paid a
    // join per side; one exchange now feeds both window columns.
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val sketchSide = cells.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))

    // exact side: per-group distinct-value CDF (domain bounded by the probe)
    val gv = base.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val wVal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val exactCum = gv.withColumn("cum", sum(col("c")).over(wVal))
      .withColumn("n", sum(col("c")).over(wAll))

    import scala.jdk.CollectionConverters._
    val qDf = broadcast(spark.createDataFrame(
      qsPermille.sorted.map(q =>
        org.apache.spark.sql.Row(q.toLong)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q_permille",
          org.apache.spark.sql.types.LongType)))))

    def pick(cumFrame: DataFrame, outCol: String, fromKey: Boolean) = {
      val target = expr("(n * q_permille + 999) div 1000")
      val hit = cumFrame.crossJoin(qDf)
        .filter(col("cum") >= target)
        .groupBy(col("g"), col("q_permille"), col("n"))
        .agg(min(if (fromKey) col("k") else col("v")).as("__pick"))
      if (fromKey)
        hit.withColumn(outCol,
          when(col("__pick") < 16L, col("__pick"))
            .otherwise(expr(
              "(16L + __pick % 16L) * " +
                "shiftleft(1L, CAST(__pick div 16L - 5L AS INT))")))
          .drop("__pick")
      else hit.withColumnRenamed("__pick", outCol)
    }
    pick(sketchSide, "sketch_estimate", fromKey = true)
      .join(pick(exactCum, "exact_value", fromKey = false),
        Seq("g", "q_permille", "n"))
      .select(col("g").as(groupCol), col("q_permille"), col("n"),
        col("sketch_estimate"), col("exact_value"),
        when(col("exact_value") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "(1000L * (sketch_estimate - exact_value)) div exact_value"))
          .as("err_permille"))
      .orderBy(col(groupCol), col("q_permille"))
  }

  /** Pre-aggregated rollup audit — the sketch's PRODUCTION pattern under
    * the gate: land per-(group, day) sketch cells ONCE, answer weekly
    * quantiles by summing CELLS (merge = count addition — no row is ever
    * re-touched), and audit the rolled-up read against the exact weekly
    * order statistic. This is what "mergeable" buys at 100 TB: the daily
    * sketch table is tiny (≤ 16·64 cells per group-day) and any window —
    * week, month, arbitrary range — rolls up from it in cell-space. Week
    * is epoch-day div 7 (pure integers; the engines' week-truncation
    * builtins disagree on boundaries).
    *
    * Output per (group, week, q): n, sketch_estimate, exact_value,
    * err_permille — the error must sit inside the sketch's one-sided
    * bound (−1/16 < err ≤ 0), which a spec asserts for every row.
    * Same bounded-domain contract as [[quantileAudit]] for the exact
    * side; values non-negative, loudly.
    */
  def rollupAudit(df: DataFrame, groupCol: String, dayCol: String,
                  valueCol: String, qsPermille: Seq[Int] = Seq(500, 990),
                  maxDistinct: Int = 200000): DataFrame = {
    require(qsPermille.nonEmpty &&
      qsPermille.forall(q => q >= 1 && q <= 1000),
      s"rollupAudit: quantiles $qsPermille outside 1..1000 permille")
    val spark = df.sparkSession
    val base = df.select(col(groupCol).as("g"),
      expr(s"datediff($dayCol, DATE '1970-01-01')").cast("long").as("d"),
      col(valueCol).cast("long").as("v"))
    // ONE eager guard probe — the bounded distinct probe doubles as the
    // sign check (see quantileAudit; the size refusal fires first, so the
    // truncated probe can never hide a negative)
    val probe = base.select(col("v")).distinct().limit(maxDistinct + 1).collect()
    require(probe.length <= maxDistinct,
      s"rollupAudit: > $maxDistinct distinct values — the exact audit " +
        "side needs a bounded domain; run the rollup without the audit")
    require(!probe.exists(r => !r.isNullAt(0) && r.getLong(0) < 0L),
      s"rollupAudit: negative $valueCol — the geometric bucket mapping " +
        "is defined for non-negative values; shift or split the domain")
    // the landed daily sketch table: ≤ 16·64 cells per (group, day)
    val daily = Stages.materialize(
      base.withColumn("k",
        when(col("v") < 16L, col("v"))
          .otherwise(expr(
            "16L * length(bin(v)) + (v div shiftleft(1L, length(bin(v)) - 5) - 16L)")))
        .groupBy(col("g"), col("d"), col("k"))
        .agg(count(lit(1)).as("c")), "ddsketch_daily")
    // weekly rollup IN CELL SPACE — merge is count addition, no raw rows
    val weekly = daily.withColumn("wk", expr("d div 7"))
      .groupBy(col("g"), col("wk"), col("k"))
      .agg(sum(col("c")).as("c"))
    // the weekly total rides the same window pass as a partition-frame sum
    // (r15, guide §2.4) — the r14 `totals` aggregate + join executed the
    // weekly subtree twice and paid a join per side
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"), col("wk")).orderBy(col("k"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"), col("wk"))
    val sketchCum = weekly.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    val gv = base.withColumn("wk", expr("d div 7"))
      .groupBy(col("g"), col("wk"), col("v"))
      .agg(count(lit(1)).as("c"))
    val wVal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"), col("wk")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val exactCum = gv.withColumn("cum", sum(col("c")).over(wVal))
      .withColumn("n", sum(col("c")).over(wAll))
    import scala.jdk.CollectionConverters._
    val qDf = broadcast(spark.createDataFrame(
      qsPermille.sorted.map(q =>
        org.apache.spark.sql.Row(q.toLong)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q_permille",
          org.apache.spark.sql.types.LongType)))))
    def pick(cumFrame: DataFrame, outCol: String, fromKey: Boolean) = {
      val target = expr("(n * q_permille + 999) div 1000")
      val hit = cumFrame.crossJoin(qDf)
        .filter(col("cum") >= target)
        .groupBy(col("g"), col("wk"), col("q_permille"), col("n"))
        .agg(min(if (fromKey) col("k") else col("v")).as("__pick"))
      if (fromKey)
        hit.withColumn(outCol,
          when(col("__pick") < 16L, col("__pick"))
            .otherwise(expr(
              "(16L + __pick % 16L) * " +
                "shiftleft(1L, CAST(__pick div 16L - 5L AS INT))")))
          .drop("__pick")
      else hit.withColumnRenamed("__pick", outCol)
    }
    pick(sketchCum, "sketch_estimate", fromKey = true)
      .join(pick(exactCum, "exact_value", fromKey = false),
        Seq("g", "wk", "q_permille", "n"))
      .select(col("g").as(groupCol), col("wk").as("week"), col("q_permille"),
        col("n"), col("sketch_estimate"), col("exact_value"),
        when(col("exact_value") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "(1000L * (sketch_estimate - exact_value)) div exact_value"))
          .as("err_permille"))
      .orderBy(col(groupCol), col("week"), col("q_permille"))
  }
}
