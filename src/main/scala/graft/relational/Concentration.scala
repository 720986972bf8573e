package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gini concentration of a discrete weight across rows (Gini 1912, with
  * tie-averaged ranks) — the corpus-balance audit: does 1% of the
  * documents own half the tokens? A training mix dominated by a few huge
  * documents packs batches badly and overweights their style; the Lorenz
  * summary says so in two numbers — the Gini index and the top-decile
  * share.
  *
  * Exactness: with tie-averaged DOUBLED ranks r2 (the [[Correlation]]
  * discipline), Gini = (Σ r2·w − (n+1)·W) / (n·W) exactly — emitted as
  * its truncating micro value; the top-decile share takes the heaviest
  * ⌈n/10⌉ rows (boundary ties resolved by the cumulative arithmetic, not
  * row identity) in truncating permille. Σ r2·w accumulates in
  * DECIMAL(38,0) (r2·w ≈ 2n·w crosses 2⁶³ near n·w ≈ 5·10¹⁸).
  *
  * Scale: the weight column must be a discrete domain (≤ `maxDistinct`
  * values — token counts, bucketed sizes); ONE map-side-combined
  * value-count aggregation comes back through a `limit(cap+1)` bounded
  * collect, ranks and the decile cutoff are a driver prefix over it
  * (bounded-model class), and one broadcast-join aggregate emits the row.
  */
object Concentration {

  /** One-row frame: (n_rows, total_weight, gini_micro,
    * top_decile_share_permille). Weights must be non-null, non-negative
    * longs with a non-zero sum.
    */
  def gini(df: DataFrame, weight: Column,
           maxDistinct: Int = 200000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = Stages.materialize(
      df.select(weight.cast("long").as("__w")), "gini_weights")
    val rows = w.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .limit(maxDistinct + 1).collect()
    require(!rows.exists(_.isNullAt(0)),
      "gini: weight contains NULLs — filter or impute first")
    require(rows.length <= maxDistinct,
      s"gini: > $maxDistinct distinct weights — the rank table is bounded " +
        "only for discrete weight domains; bucketize first")
    val classes = rows.map(r => (r.getLong(0), r.getLong(1)))
    require(classes.forall(_._1 >= 0), "gini: negative weights are undefined")
    val n = classes.map(_._2).sum
    val total = classes.map { case (v, c) => v * c }.sum
    require(total > 0, "gini: zero total weight — the Lorenz curve is undefined")
    // doubled tie-averaged ranks ascending by weight
    val asc = classes.sortBy(_._1)
    var below = 0L
    val ranked = asc.map { case (v, c) =>
      val r2 = 2L * below + c + 1L; below += c; (v, r2)
    }
    // top-decile cutoff from the descending cumulative (driver, bounded)
    val k = (n + 9L) / 10L
    var cumC = 0L; var cumT = 0L; var topTokens = 0L; var found = false
    classes.sortBy(-_._1).foreach { case (v, c) =>
      if (!found) {
        cumC += c; cumT += v * c
        if (cumC >= k) { topTokens = cumT - (cumC - k) * v; found = true }
      }
    }
    val d38 = DecimalType(38, 0)
    val rk = broadcast(ranked.toSeq.toDF("__v", "__r2"))
    w.join(rk, col("__w") === col("__v"))
      .agg(sum((col("__r2").cast(d38) * col("__w").cast(d38))).as("__srw"))
      .select(lit(n).as("n_rows"), lit(total).as("total_weight"),
        expr(s"(CAST(1000000 AS DECIMAL(38,0)) * (__srw - CAST(${n + 1L} AS DECIMAL(38,0)) * $total))" +
          s" div (CAST($n AS DECIMAL(38,0)) * $total)").as("gini_micro"),
        // driver arithmetic on the bounded table (1000·topTokens stays in
        // long to ~9·10¹⁵ tokens; positive, so / == truncating div)
        lit(1000L * topTokens / total).as("top_decile_share_permille"))
  }
}
