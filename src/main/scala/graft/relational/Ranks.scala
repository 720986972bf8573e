package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact 1-based ranks for ANSWER-SIZED frames, with no window function.
  *
  * `row_number().over(Window.orderBy(...))` with no `partitionBy` collapses
  * the entire input into ONE task for the sort — the classic single-partition
  * scale-killer (Spark itself warns when it plans one). The scale-safe shape
  * is: take the top-k FIRST (`orderBy(...).limit(k)` lowers to
  * TakeOrderedAndProject — a per-partition bounded heap plus an answer-sized
  * driver merge, no global sort), then rank only the k survivors.
  *
  * For the survivors, rank = 1 + |rows sorting strictly before|, computed
  * here with a broadcast non-equi self-join + aggregation: O(k²) comparisons
  * over k rows, fully distributed, zero single-partition stages and zero
  * Window nodes anywhere in the plan. Only call this on bounded frames
  * (top-k shortlists); at corpus scale, shortlist first.
  */
object Ranks {

  /** Rank every row of a bounded `df` under the total order given by
    * `order` — (column, ascending) pairs, lexicographic. The order MUST be
    * total (include a unique tiebreaker column): tied rows would both
    * receive the lower rank and the groupBy would collapse duplicates.
    *
    * Output = all columns of `df` plus `rankName` (long, 1-based).
    */
  def boundedRank(df: DataFrame, rankName: String, order: Seq[(String, Boolean)]): DataFrame = {
    require(order.nonEmpty, "boundedRank needs at least one order column")
    val probe = df.select(order.map { case (c, _) => col(c).as(s"__rk_$c") }: _*)
    // lexicographic "probe row sorts strictly before this row"
    val before: Column = order.indices.map { i =>
      val eqPrefix = order.take(i)
        .map { case (p, _) => col(s"__rk_$p") === col(p) }
        .foldLeft(lit(true))(_ && _)
      val (c, asc) = order(i)
      val lt = if (asc) col(s"__rk_$c") < col(c) else col(s"__rk_$c") > col(c)
      eqPrefix && lt
    }.reduce(_ || _)
    df.join(broadcast(probe), before, "left")
      .groupBy(df.columns.map(col): _*)
      .agg((count(col(s"__rk_${order.head._1}")) + 1).cast("long").as(rankName))
  }
}
