package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit (Sweeney 2002) — before a dataset with
  * quasi-identifiers ships, measure re-identification exposure: a row
  * whose quasi-identifier combination is shared by fewer than k rows is
  * linkable. This is the release gate that pairs with
  * [[graft.text.Redact]]'s pseudonymization (pseudonyms preserve JOIN
  * structure, so they do NOT fix small QI groups — only generalization
  * or suppression does; this audit says where).
  *
  * Scale: ONE aggregation builds the QI group-size frame (map-side
  * combined; output is QI-cardinality-sized and stays distributed), then
  * each requested k is a 1-row conditional aggregate over it — the
  * size frame lands once however many thresholds are asked for. Exact
  * truncating-division permille.
  */
object Privacy {

  /** One row per k in `ks`: (k, n_groups, groups_at_risk, rows_at_risk,
    * rows_at_risk_permille) where "at risk" = QI group size < k. NULL QI
    * values form groups like any other value (null-safe grouping), since
    * a shared "unknown" is still a linkable signature.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], ks: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(ks.nonEmpty && ks.forall(_ >= 2), "each k must be >= 2")
    val sizes = Stages.materialize(
      df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__sz"))
        .select(col("__sz")), "kanon_sizes")
    ks.map { k =>
      sizes.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__sz") < k, 1L).otherwise(0L)).as("groups_at_risk"),
        sum(when(col("__sz") < k, col("__sz")).otherwise(lit(0L)))
          .as("rows_at_risk"),
        sum(col("__sz")).as("__total"))
        .select(lit(k.toLong).as("k"), col("n_groups"),
          col("groups_at_risk"), col("rows_at_risk"),
          expr("(1000L * rows_at_risk) div __total")
            .as("rows_at_risk_permille"))
    }.reduce(_ unionByName _)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    * blind spot: a QI group can be large yet carry ONE sensitive value,
    * so membership alone discloses it (the homogeneity attack). A group
    * is at risk when its sensitive attribute takes fewer than l distinct
    * values. Same scale shape as [[kAnonymity]]: ONE aggregation builds
    * the per-QI-group (size, distinct-sensitive) frame — the distinct is
    * per group, partial-aggregated map-side — landed once, then each l
    * is a 1-row conditional aggregate.
    *
    * One row per l: (l, n_groups, groups_at_risk, rows_at_risk,
    * rows_at_risk_permille), at-risk = distinct sensitive values < l.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 ls: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty, "lDiversity needs at least one quasi-identifier")
    require(ls.nonEmpty && ls.forall(_ >= 2), "each l must be >= 2")
    val sizes = Stages.materialize(
      df.groupBy(qiCols.map(col): _*)
        .agg(count(lit(1)).as("__sz"),
          countDistinct(col(sensitiveCol)).as("__ld"))
        .select(col("__sz"), col("__ld")), "ldiv_sizes")
    ls.map { l =>
      sizes.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__ld") < l, 1L).otherwise(0L)).as("groups_at_risk"),
        sum(when(col("__ld") < l, col("__sz")).otherwise(lit(0L)))
          .as("rows_at_risk"),
        sum(col("__sz")).as("__total"))
        .select(lit(l.toLong).as("l"), col("n_groups"),
          col("groups_at_risk"), col("rows_at_risk"),
          expr("(1000L * rows_at_risk) div __total")
            .as("rows_at_risk_permille"))
    }.reduce(_ unionByName _)
  }
}
