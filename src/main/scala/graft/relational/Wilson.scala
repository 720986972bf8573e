package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wilson score lower bound (Wilson 1927) for per-group pass rates — the
  * "safe sort" for quality gates: a source with 3/3 passing must NOT
  * outrank one with 96/100, which is exactly what sorting by the raw rate
  * does. The lower confidence bound shrinks toward zero as evidence thins,
  * so small groups rank below well-measured ones at the same point rate.
  *
  * Portability: at z = 2 (the ~95.45% bound) every input to the closed
  * form is an exact integer — lower = (k + 2 − 2·√(k·(n−k)/n + 1)) /
  * (n + 4) — so the whole statistic is ONE IEEE expression over exact
  * longs (sqrt is correctly-rounded everywhere), written with identical
  * parenthesization in the oracle; the emitted micro value is its exact
  * floor. The usual z = 1.96 would smuggle a decimal constant into every
  * term for a bound 2% tighter — not worth the portability risk.
  *
  * Scale: one conditional aggregation (map-side combined) per group; the
  * output is group-cardinality-sized. No joins, no windows, no collect.
  */
object Wilson {

  /** (group, n, k, pass_permille, wilson_lower_micro) per `groupCol`,
    * where k counts rows with `pass` true. NULL pass values count as
    * failures (a gate that could not evaluate did not pass).
    */
  def lowerBound(df: DataFrame, groupCol: String, pass: Column): DataFrame = {
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(pass, 1L).otherwise(0L)).as("k"))
    val nd = col("n").cast("double")
    val kd = col("k").cast("double")
    val lower = (kd + lit(2.0) - lit(2.0) *
      sqrt(kd * (nd - kd) / nd + lit(1.0))) / (nd + lit(4.0))
    agg.select(col(groupCol), col("n"), col("k"),
      expr("(1000L * k) div n").as("pass_permille"),
      floor(lit(1e6) * lower).cast("long").as("wilson_lower_micro"))
  }
}
