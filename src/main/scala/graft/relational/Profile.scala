package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the ANALYZE/data-quality primitive: per
  * column, row count, null count, exact distinct count, min and max.
  *
  * Shape: ONE aggregation over the table computes every column's stats
  * (Catalyst plans multi-distinct aggregates via a single expand+partial
  * pipeline — still one scan), then the single wide row unpivots to one row
  * per column. At 100 TB profiling cost is the scan, which is the floor;
  * nothing is collected per-value on the driver.
  *
  * Values are surfaced as strings for a uniform schema; callers needing
  * typed bounds profile the column directly.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
