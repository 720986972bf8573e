package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-insensitive content fingerprint per group — the cross-engine
  * "did the copy arrive intact" primitive (the additive-checksum idea
  * behind replication validators: a COMMUTATIVE digest needs no sort, no
  * canonical order, no single reducer). Each row contributes the house
  * 60-bit md5 slice of its canonical serialization (fields joined by the
  *  unit separator — unambiguous as long as no field contains it,
  * which a per-row raise_error guard enforces loudly rather than
  * assumes); the group fingerprint is the exact SUM in DECIMAL(38,0)
  * beside the row count. Sum-of-hashes is replayable anywhere, merges
  * across shards by addition, and detects any single-row change with
  * probability 1 − 2⁻⁶⁰; duplicate-row multiplicity is part of the sum,
  * and the per-group row count pins the cardinality beside it.
  *
  * Scale: one projection + one map-side-combined keyed sum; DECIMAL(38,0)
  * holds ~10¹⁹ rows of 2⁶⁰-sized terms before overflow — documented
  * bound, far past any real table. The sum is emitted as a STRING (it
  * exceeds long; the house DECIMAL-as-string discipline, see Dispersion).
  */
object Checksum {

  private val Sep = ""

  /** (group, n_rows, content_sum) per group, group order. `cols` are the
    * value columns folded into the canonical serialization (cast to
    * string; concat_ws SKIPS null fields and their separator — Spark and
    * DuckDB agree — so a caller who must distinguish ('a', NULL) from
    * ('a') coalesces a sentinel first). */
  def perGroup(df: DataFrame, groupCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum: no value columns")
    val serialized = concat_ws(Sep,
      cols.map(c => col(c).cast("string")): _*)
    // a field containing the separator would let two DIFFERENT rows
    // serialize identically — fail the row loudly instead of
    // fingerprinting an ambiguous encoding
    val dirty = cols.map(c => col(c).cast("string").contains(Sep))
      .reduce(_ || _)
    val guarded = when(coalesce(dirty, lit(false)),
      raise_error(lit("checksum: a field contains the \\u001f separator — " +
        "pre-escape or drop the column"))).otherwise(serialized)
    df.select(col(groupCol).as("g"),
      graft.functions.HashFunctions.md5Bits60(guarded).as("h"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("content_sum"))
      .select(col("g").as(groupCol), col("n_rows"),
        col("content_sum").cast("string").as("content_sum"))
      .orderBy(col(groupCol))
  }
}
