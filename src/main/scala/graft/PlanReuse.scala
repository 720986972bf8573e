package graft
import org.apache.spark.sql.SparkSession

/** Dev diagnostic (not driver contract): executes named declared queries and
  * reports exchange-reuse stats from the FINAL AQE plan — ReusedExchange
  * count, distinct shuffle stages, and parquet-scan fan-out. Counting the
  * pre-execution plan (or `plan.toString`'s "Initial Plan" section) both
  * over-report scans; this drives the query's own QueryExecution to
  * completion first and splits off the final section. Used to find the
  * stage-recompute fan-out that `relational/Stages.anchor` closes.
  */
object PlanReuse {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val byName = queries.Registry.all.map(q => q.name -> q.fn).toMap
    args.foreach { name =>
      val df = byName(name)(spark, dir)
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      // AQE toString carries BOTH "== Final Plan ==" and "== Initial Plan ==";
      // count only the executed (final) section.
      val whole = qe.executedPlan.toString
      val plan = whole.split("== Initial Plan ==")(0)
      val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
      val dup = stageIds.size - stageIds.distinct.size
      val reused = "ReusedExchange".r.findAllIn(plan).size
      val scans = "FileScan parquet".r.findAllIn(plan).size
      println(s"[reuse] $name final=${plan.contains("isFinalPlan=true")} stages=${stageIds.distinct.size} dupStageRefs=$dup reusedExchange=$reused parquetScans=$scans")
      if (sys.env.contains("PLAN_DUMP")) println(plan)
    }
    spark.stop()
  }
}
