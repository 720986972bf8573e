package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for corpus curation.
  *
  * `DataFrame.sample` draws from a per-partition RNG: results change with
  * partitioning, task retries, and engine — unacceptable for reproducible
  * training-data builds. These operators derive the sampling decision from a
  * content/key hash instead, so a sample is a pure function of the data:
  * re-runs, re-partitions, and other engines (md5 is md5 everywhere) agree
  * row for row. This is the standard "hash-mod sampling" used for stable
  * train/eval splits.
  */
object Sampling {

  /** Uniform keyed sample: keep ≈ `fraction` of rows, decided by the md5 of
    * the key column. Stable under any partitioning and across engines.
    */
  def deterministicSample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    // first 8 hex chars of md5 = 32 uniform bits
    val bucket = conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10).cast("long")
    df.filter(bucket < (fraction * (1L << 32)).toLong)
  }

  /** Stratified fixed-size sample: exactly `perStratum` rows per stratum,
    * chosen by hash order (deterministic, unbiased within stratum). One
    * window pass; no RNG, no state.
    */
  def stratifiedSample(df: DataFrame, stratumCols: Seq[String], keyCol: Column,
                       perStratum: Int): DataFrame = {
    val w = Window.partitionBy(stratumCols.map(col): _*)
      .orderBy(md5(keyCol.cast("string")), keyCol.cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Deterministic train/eval split tag from the key hash: `eval_fraction`
    * of rows get 'eval', the rest 'train' — stable forever, join-free.
    */
  def splitTag(keyCol: Column, evalFraction: Double): Column = {
    val bucket = conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10).cast("long")
    when(bucket < (evalFraction * (1L << 32)).toLong, "eval").otherwise("train")
  }
}
