package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping/join keys (SURVEY.md §2: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew handling covers shuffle *joins*; a skewed **aggregation** key
  * (one key holding a large share of all rows) still funnels that key's
  * entire partition through one task in the final aggregate. Salting splits
  * each key into `saltBuckets` sub-keys for the first (heavy) aggregation
  * pass, then combines the per-salt partials — two light shuffles instead of
  * one hot one. Worth it only for re-aggregatable ("algebraic") aggregates:
  * sum/count/min/max compose; avg must be carried as (sum, count).
  */
object Skew {

  /** Deterministic salt in [0, saltBuckets) — hash of the full row's key
    * plus a spreading column can't be used on the agg path (the key IS the
    * group), so spread by a cheap hash of a high-cardinality column.
    */
  def salt(spreadCol: Column, saltBuckets: Int): Column =
    pmod(hash(spreadCol), lit(saltBuckets))

  /** Skew-safe salted equi join: the big (skewed) side gets a deterministic
    * salt in [0, saltBuckets); the small side is replicated once per salt
    * value, so every big-side row still matches its dimension row exactly
    * once and the hot key's rows spread over `saltBuckets` shuffle
    * partitions instead of one. Output equals the plain equi join for ANY
    * salt assignment — determinism doesn't depend on the hash. Use when the
    * small side is too big to broadcast outright but `|small| · saltBuckets`
    * still shuffles cheaply; for broadcastable dims, `broadcast(small)`
    * already avoids the skew entirely.
    */
  def saltedJoin(big: DataFrame, bigKey: String, small: DataFrame,
                 smallKey: String, spreadCol: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val b = big.withColumn("__salt", salt(spreadCol, saltBuckets))
    val sm = small.withColumn("__salt2",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    b.join(sm, b(bigKey) === sm(smallKey) && b("__salt") === sm("__salt2"))
      .drop("__salt", "__salt2")
  }

  /** Two-phase salted sum/count aggregation.
    *
    * @param df          input
    * @param keyCols     hot grouping keys
    * @param spreadCol   high-cardinality column used only to spread rows
    * @param saltBuckets number of sub-keys per hot key
    * @param sumCols     (inputCol → outputName) exact-summable columns
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], spreadCol: String,
                     saltBuckets: Int, sumCols: Seq[(Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt", salt(col(spreadCol), saltBuckets))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pn"),
        sumCols.zipWithIndex.map { case ((c, _), i) => sum(c).as(s"__p$i") }: _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__pn")).as("n"),
        sumCols.zipWithIndex.map { case ((_, name), i) =>
          sum(col(s"__p$i")).as(name)
        }: _*)
  }
}
