package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** Lagged Pearson autocorrelation of a per-day event-count series (the ACF
  * of Box–Jenkins practice, computed as the plain Pearson r between the
  * series and its lag-L shift) — the seasonality detector for ingest
  * monitoring: a weekly cadence shows as a ρ spike at lag 7, a trending
  * series keeps high ρ at every small lag, and white-noise arrivals decay
  * to ≈ 0 immediately. [[Changepoint]] asks "did the level jump";
  * [[TheilSen]] asks "what is the trend"; this asks "is there a CYCLE" —
  * the third time-series question a pipeline dashboard needs.
  *
  * Exactness: daily counts are exact longs; for each lag the five S-sums
  * accumulate in DECIMAL(38,0) (Σxy ≤ n·C² stays inside 38 digits to
  * n ≈ 10⁵ days at C ≈ 10¹⁶ events/day — beyond any corpus), and ρ is ONE
  * IEEE expression over the exact sums with identical parenthesization in
  * the DuckDB oracle (the [[Correlation]] discipline). A lag whose series
  * restriction is constant has zero variance — its ρ is emitted as NULL
  * (SQL's undefined), never NaN.
  *
  * Scale: the corpus touches ONE map-side-combined day aggregation; the
  * day table (calendar-bounded, not data-bounded) then self-joins per lag
  * via a row-local lag explode — equi-keyed on `day + lag`, no window over
  * the corpus, no cross join. Gap days pair only where both endpoints
  * exist (lag pairs are over the OBSERVED day table; a sparse series
  * autocorrelates its observed support).
  */
object Autocorr {

  /** Per-lag frame: (lag, n_pairs, acf) for lag = 1..maxLag, full order.
    * `tsCol` must be a TIMESTAMP column (the [[RateAudit]] contract —
    * a silent long/ts coercion would shift the day grid).
    */
  def dailyAcf(df: DataFrame, tsCol: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366,
      s"dailyAcf: maxLag=$maxLag outside 1..366 — lags beyond a year of " +
        "daily grain are a different (monthly/yearly) resampling question")
    require(df.schema(tsCol).dataType == TimestampType,
      s"dailyAcf: '$tsCol' must be TIMESTAMP (got " +
        s"${df.schema(tsCol).dataType}) — cast explicitly so the day grid " +
        "is defined, not coerced")
    // ONE corpus aggregation; the day table feeds base + lag sides
    val daily = Stages.materialize(
      df.select(expr(s"cast($tsCol as long) div 86400").as("__day"))
        .groupBy(col("__day")).agg(count(lit(1)).as("__c")),
      "acf_daily_counts")
    val lagged = daily
      .withColumn("__lag", explode(typedLit((1 to maxLag).map(_.toLong))))
      .select(col("__lag"), (col("__day") + col("__lag")).as("__dk"),
        col("__c").as("__x"))
    val d38 = DecimalType(38, 0)
    lagged
      .join(daily.select(col("__day").as("__dk"), col("__c").as("__y")),
        Seq("__dk"))
      .groupBy(col("__lag"))
      .agg(
        count(lit(1)).cast(d38).as("__n"),
        sum(col("__x").cast(d38)).as("__sx"),
        sum(col("__y").cast(d38)).as("__sy"),
        sum((col("__x") * col("__x")).cast(d38)).as("__sxx"),
        sum((col("__y") * col("__y")).cast(d38)).as("__syy"),
        sum((col("__x") * col("__y")).cast(d38)).as("__sxy"))
      .select(col("__lag").cast("long").as("lag"),
        col("__n").cast("long").as("n_pairs"),
        when(
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")) > 0 &&
            (col("__n") * col("__syy") - col("__sy") * col("__sy")) > 0,
          (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
            (sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")) *
              sqrt((col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double"))))
          .as("acf"))
      .orderBy(col("lag"))
  }

  /** Lead–lag cross-correlation between the daily-count series of two
    * event types: xcf(lag) = Pearson ρ(a_d, b_{d+lag}) for lag = −maxLag..
    * +maxLag — positive lag peaking means `typeA` LEADS `typeB` by that
    * many days (the funnel-latency question asked of the whole series,
    * where [[dailyAcf]] asks it of one series against itself). Day support
    * is days with ≥ 1 event of either type; a day in support counts 0 for
    * an absent type (a true zero, not a gap). Same exactness/scale shape
    * as [[dailyAcf]]: one conditional day aggregation, row-local lag
    * explode, equi-join, DECIMAL(38,0) S-sums, one shared IEEE ρ, NULL on
    * zero variance.
    */
  def dailyXcf(df: DataFrame, tsCol: String, typeCol: String,
               typeA: String, typeB: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366,
      s"dailyXcf: maxLag=$maxLag outside 1..366")
    require(typeA != typeB,
      "dailyXcf: identical types — that question is dailyAcf")
    require(df.schema(tsCol).dataType == TimestampType,
      s"dailyXcf: '$tsCol' must be TIMESTAMP (got " +
        s"${df.schema(tsCol).dataType})")
    val daily = Stages.materialize(
      df.filter(col(typeCol).isin(typeA, typeB))
        .select(expr(s"cast($tsCol as long) div 86400").as("__day"),
          col(typeCol).as("__t"))
        .groupBy(col("__day"))
        .agg(sum(when(col("__t") === typeA, 1L).otherwise(0L)).as("__a"),
          sum(when(col("__t") === typeB, 1L).otherwise(0L)).as("__b")),
      "xcf_daily_counts")
    val lagged = daily
      .withColumn("__lag",
        explode(typedLit((-maxLag to maxLag).map(_.toLong))))
      .select(col("__lag"), (col("__day") + col("__lag")).as("__dk"),
        col("__a").as("__x"))
    val d38 = DecimalType(38, 0)
    lagged
      .join(daily.select(col("__day").as("__dk"), col("__b").as("__y")),
        Seq("__dk"))
      .groupBy(col("__lag"))
      .agg(
        count(lit(1)).cast(d38).as("__n"),
        sum(col("__x").cast(d38)).as("__sx"),
        sum(col("__y").cast(d38)).as("__sy"),
        sum((col("__x") * col("__x")).cast(d38)).as("__sxx"),
        sum((col("__y") * col("__y")).cast(d38)).as("__syy"),
        sum((col("__x") * col("__y")).cast(d38)).as("__sxy"))
      .select(col("__lag").cast("long").as("lag"),
        col("__n").cast("long").as("n_pairs"),
        when(
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")) > 0 &&
            (col("__n") * col("__syy") - col("__sy") * col("__sy")) > 0,
          (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
            (sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")) *
              sqrt((col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double"))))
          .as("xcf"))
      .orderBy(col("lag"))
  }
}
