package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The no-DECIMAL-outputs invariant (round-8 lesson): decimal-typed output
  * columns canonicalize differently across oracle environments even when
  * every value agrees — the only two r8 driver-gate hash failures were the
  * only two decimal-typed outputs in the suite. DECIMAL stays legal INSIDE
  * a plan; the close gate ([[PlanAudit.decimalColumns]] → `dec=` column →
  * close_round.sh grep) refuses any query that EMITS one. This spec proves
  * the detector is red on the shapes that slipped through r8 (flat, nested,
  * array, map) and green on the two repaired queries.
  */
class NoDecimalOutputSpec extends SparkSpec {

  test("decimalColumns flags flat, nested, array and map decimal columns") {
    val dec = DecimalType(12, 2)
    assert(PlanAudit.decimalColumns(StructType(Seq(
      StructField("a", dec)))) === 1)
    assert(PlanAudit.decimalColumns(StructType(Seq(
      StructField("a", StructType(Seq(StructField("b", dec))))))) === 1)
    assert(PlanAudit.decimalColumns(StructType(Seq(
      StructField("a", ArrayType(dec))))) === 1)
    assert(PlanAudit.decimalColumns(StructType(Seq(
      StructField("a", MapType(StringType, dec))))) === 1)
    assert(PlanAudit.decimalColumns(StructType(Seq(
      StructField("a", DoubleType), StructField("b", LongType)))) === 0)
  }

  test("decimalColumns is red on a deliberately-decimal query frame") {
    // the exact r8 failure shape: a grouping key cast to DECIMAL(12,2)
    // surviving into the output list
    val df = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(col("o_totalprice").cast(DecimalType(12, 2)).as("p"))
      .agg(count(lit(1)).as("n"))
    assert(PlanAudit.decimalColumns(df.schema) === 1)
  }

  test("the two repaired queries emit no decimal columns and stay nonempty") {
    Seq("q18_large_volume", "q2_min_cost_supplier").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf0001)
      assert(PlanAudit.decimalColumns(df.schema) === 0,
        s"$q emits a DECIMAL output column: ${df.schema.treeString}")
      assert(df.count() > 0, s"$q returned no rows at sf0.001")
    }
  }
}
