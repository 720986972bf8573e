package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit (dev tool): prints physical-plan diagnostics per declared
  * query — exchange (shuffle) count, broadcast joins, parquet pushdown — so
  * plan regressions are visible without reading full explains.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = args.headOption
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.contains) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan.toString
          val exchanges = "Exchange".r.findAllIn(plan).length -
            "BroadcastExchange".r.findAllIn(plan).length
          val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
          val smj = "SortMergeJoin".r.findAllIn(plan).length
          val bnl = "BroadcastNestedLoop".r.findAllIn(plan).length
          val cart = "CartesianProduct".r.findAllIn(plan).length
          val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
          val wsc = "WholeStageCodegen".r.findAllIn(plan).length
          println(f"[plan] $name%-32s shuf=$exchanges%-3d bhj=$bhj%-2d smj=$smj%-2d " +
            f"bnl=$bnl%-2d cart=$cart%-2d pushedFilters=$pushed%-2d codegenSpans=$wsc%-2d")
          if (only.isDefined) println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch {
          case e: Throwable => println(s"[plan] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
