package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series completeness operators: date-spine gap filling and
  * forward-fill — the ETL steps that turn sparse event dates into dense,
  * analysis-ready series (every chart, join-on-date, and window metric
  * downstream assumes no missing rows).
  *
  * Scale shape: the spine is keys × days — bounded by the key cardinality
  * and the calendar, not the fact table — built from a broadcast single-row
  * bounds aggregate and an exploded `sequence()`. The fact side is
  * aggregated BEFORE the join, so the join carries one row per (key, day)
  * on each side. Forward-fill is one window pass per key, the same
  * partitioning the spine join already produced.
  */
object GapFill {

  /** Complete (key…, date, n) grid between the global date bounds with
    * zero-filled daily counts.
    */
  def dailyCounts(df: DataFrame, keyCols: Seq[String], dateCol: String): DataFrame = {
    val bounds = df.agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
    val spine = df.select(keyCols.map(col): _*).distinct()
      .crossJoin(broadcast(bounds))
      .select(keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day"))).as(dateCol): _*)
    val actual = df.groupBy((keyCols :+ dateCol).map(col): _*)
      .agg(count(lit(1)).as("n"))
    spine.join(actual, keyCols :+ dateCol, "left")
      .na.fill(0L, Seq("n"))
  }

  /** Forward-fill NULLs in `valueCols` with the latest earlier non-null
    * value within each key, ordered by `orderCol` (nulls before any value
    * stay null).
    */
  def forwardFill(df: DataFrame, keyCols: Seq[String], orderCol: String,
                  valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
