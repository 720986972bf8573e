package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit (dev tool): prints physical-plan diagnostics per declared
  * query — exchange (shuffle) count, broadcast joins, parquet pushdown — so
  * plan regressions are visible without reading full explains.
  */
object PlanAudit {

  /** Count DecimalType columns anywhere in a schema (nested included).
    *
    * The r8 lesson: the only two queries whose OUTPUT schema carried a raw
    * DECIMAL were the only two driver-gate hash failures — decimal-typed
    * outputs canonicalize differently across oracle environments even when
    * every value agrees. DECIMAL stays legal INSIDE a plan (exact money
    * equality, exact min-joins); it must never reach a declared query's
    * output. PlanAudit prints the count per query and close_round.sh
    * refuses to close on any nonzero.
    */
  def decimalColumns(dt: org.apache.spark.sql.types.DataType): Int = {
    import org.apache.spark.sql.types._
    dt match {
      case _: DecimalType => 1
      case s: StructType => s.fields.map(f => decimalColumns(f.dataType)).sum
      case a: ArrayType => decimalColumns(a.elementType)
      case m: MapType => decimalColumns(m.keyType) + decimalColumns(m.valueType)
      case _ => 0
    }
  }

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
          // Execute first: AQE only inserts WholeStageCodegen spans (and its
          // runtime join/partition re-plans) while stages materialize, so the
          // pre-execution plan string under-reports codegen (r1 audit showed
          // 0 spans everywhere) and misses AQE's SMJ->BHJ conversions.
          // (collect, not count: count() wraps df in a NEW aggregate plan and
          // executes that, leaving df's own AQE plan unfinalized)
          df.collect()
          // Finalized AQE toString prints "== Final Plan ==" followed by
          // "== Initial Plan ==" — audit only the final section.
          val plan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==")(0)
          val exchanges = "Exchange".r.findAllIn(plan).length -
            "BroadcastExchange".r.findAllIn(plan).length
          val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
          val smj = "SortMergeJoin".r.findAllIn(plan).length
          val bnl = "BroadcastNestedLoop".r.findAllIn(plan).length
          val cart = "CartesianProduct".r.findAllIn(plan).length
          val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
          // In the simple plan string a codegen span is the `*(n)` node
          // prefix, not the word "WholeStageCodegen" — count distinct ids.
          val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
          val dec = decimalColumns(df.schema)
          println(f"[plan] $name%-32s shuf=$exchanges%-3d bhj=$bhj%-2d smj=$smj%-2d " +
            f"bnl=$bnl%-2d cart=$cart%-2d pushedFilters=$pushed%-2d codegenSpans=$wsc%-2d " +
            f"dec=$dec%-2d")
          if (only.isDefined) println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch {
          case e: Throwable => println(s"[plan] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
