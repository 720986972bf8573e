package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic curriculum interleaving — materialize a TRAINING ORDER
  * where sources alternate in a fixed stride (position p serves source
  * p mod S, each source feeding its own quality-ranked queue). This is the
  * "data ordering" stage of a training pipeline: quality-first within a
  * source, source-balanced globally, and fully reproducible (no RNG).
  *
  * Scale design: one window per SOURCE (hash-partitioned on source — large
  * sources parallelize across their partition only, which is acceptable
  * because ranking is the per-source queue semantics; a skew-heavy corpus
  * should pre-bucket by (source, salt) and rank with the two-phase
  * prefix-sum instead, see [[graft.relational.PrefixSum]]), plus one
  * bounded driver collect of the DISTINCT SOURCE list (dimension-sized —
  * the same bounded-collect class as k-means centroids) to assign stride
  * offsets without a global window.
  */
object Curriculum {

  /** (input columns) + rank_in_source (1-based, by score desc then id) and
    * global_pos (0-based stride-interleaved position): position
    * (r−1)·S + idx for a source at stride offset idx guarantees the first S
    * positions hold every source's best doc, the next S their second-best,
    * and so on.
    */
  def strideInterleave(docs: DataFrame, idCol: String, sourceCol: String,
                       score: Column, maxSources: Int = 10000): DataFrame = {
    // bounded-model collect discipline: the distinct source list is
    // dimension-sized BY CONTRACT — limit(cap+1) makes a violated contract
    // fail loudly instead of OOMing the driver on a high-cardinality column
    // mistakenly passed as the source
    val srcRows = docs.select(col(sourceCol).cast("string").as("__s"))
      .distinct().limit(maxSources + 1).collect()
    require(srcRows.length <= maxSources,
      s"strideInterleave: more than $maxSources distinct values in " +
        s"'$sourceCol' — not a source dimension; raise maxSources only if " +
        "the driver can hold the offset table")
    // a null source would silently drop its rows at the offset join below
    require(srcRows.forall(!_.isNullAt(0)),
      s"$sourceCol must be non-null for stride interleaving")
    val srcs = srcRows.map(_.getString(0)).sorted
    val s = srcs.length.toLong
    val idx = srcs.zipWithIndex.toSeq
    val spark = docs.sparkSession
    import spark.implicits._
    val dim = idx.map { case (name, i) => (name, i.toLong) }
      .toDF("__s", "__src_idx")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(score.desc, col(idCol))
    docs
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .join(broadcast(dim), col(sourceCol).cast("string") === col("__s"))
      .withColumn("global_pos",
        (col("rank_in_source") - 1L) * s + col("__src_idx"))
      .drop("__s", "__src_idx")
  }
}
