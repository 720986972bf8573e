package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Equi-join output-cardinality pre-flight — answer |A ⋈ B| EXACTLY
  * before paying for the join: the output size is Σ_k c_A(k)·c_B(k), a
  * key-counts join that costs two aggregations instead of the join's full
  * shuffle-and-materialize. The companion to [[SkewProfile]]: that one
  * diagnoses one side's key skew, this one prices the actual join —
  * including the single worst key, which is what decides between a plain
  * shuffle join, [[Skew.saltedJoin]], or refusing to run.
  *
  * Exactness: per-key products and their sum accumulate in
  * DECIMAL(38,0) (c_A·c_B can pass 2⁶³ at ~10⁹×10⁹ rows on one hot key —
  * the ADVICE-r7 long-overflow class); the two unbounded outputs are
  * emitted as decimal STRINGS (the [[graft.vector.Dispersion]]
  * precedent), counts as longs. The top-key share avoids the 10³·mx
  * overflow by dividing est first when est ≥ 1000 — same branch, same
  * truncation, in the oracle.
  *
  * Scale: two map-side-combined key aggregations, one key-sized equi-join
  * between them, one scalar fold. Nothing key-cardinality-sized is
  * broadcast or collected.
  */
object JoinPreflight {

  /** 1-row frame: (est_rows_str, n_matched_keys, max_key_product_str,
    * top_key_share_permille). NULL keys never match in an equi-join and
    * are excluded on both sides.
    */
  def cardinality(left: DataFrame, leftKey: String,
                  right: DataFrame, rightKey: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val cl = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__ca"))
    val cr = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__cb"))
    cl.join(cr, Seq("__k"))
      .select((col("__ca").cast(d38) * col("__cb").cast(d38)).as("__p"))
      .agg(sum(col("__p")).cast(d38).as("__est"),
        count(lit(1)).as("n_matched_keys"),
        max(col("__p")).cast(d38).as("__mx"))
      .select(
        col("__est").cast("string").as("est_rows_str"),
        col("n_matched_keys"),
        col("__mx").cast("string").as("max_key_product_str"),
        when(col("__est") >= 1000,
          expr("__mx div (__est div 1000)"))
          .otherwise(expr("(1000 * __mx) div __est"))
          .cast("long").as("top_key_share_permille"))
  }
}
