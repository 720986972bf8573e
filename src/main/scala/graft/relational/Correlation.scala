package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spearman rank correlation between two numeric columns (Spearman 1904) —
  * the signal-agreement audit for data curation: do two quality signals
  * (length, entropy, NB margin, perplexity) ORDER the corpus the same way?
  * Rank correlation is the right tool where Pearson is scale-bound; ranks
  * are exact integers, so the whole statistic is engine-portable.
  *
  * Exactness: ties take the average rank, kept integer by DOUBLING —
  * r2(v) = 2·below(v) + ties(v) + 1 (the constant factor cancels from ρ).
  * The five S-sums over r2 accumulate in DECIMAL(38,0) (Σr·r ≤ 4n³ and the
  * ρ numerator n·Σxy ≤ 4n⁴ cross 2⁶³ near n ≈ 10⁵ — and stay inside 38
  * digits to n ≈ 4·10⁹ rows, the documented bound); ρ itself is then ONE
  * IEEE expression over exact integers — num/(sqrt(dx)·sqrt(dy)) with
  * identical parenthesization in the DuckDB oracle, so it hash-matches.
  *
  * Scale: per-signal ranks come from the distinct-VALUE frame (discrete
  * score domains — the [[QuantileRank]] bounded-domain contract, enforced
  * by the same capped probe) via the two-phase [[PrefixSum]] (no global
  * window); rank frames broadcast-join back; one map-side-combined
  * aggregate emits a single row.
  */
object Correlation {

  /** One-row frame: (n, spearman_rho). Both columns must be non-null,
    * discrete-domain (≤ maxDistinct values), and non-constant (a constant
    * signal has zero rank variance — ρ is undefined; fails loudly rather
    * than emitting NaN).
    */
  def spearman(df: DataFrame, xCol: String, yCol: String,
               maxDistinct: Int = 200000): DataFrame = {
    def rank2(c: String): DataFrame = {
      val probe = df.select(col(c)).distinct().limit(maxDistinct + 1).collect()
      require(!probe.exists(_.isNullAt(0)),
        s"spearman: '$c' contains NULLs — a NULL has no rank; filter or " +
          "impute first")
      require(probe.length <= maxDistinct,
        s"spearman: '$c' has > $maxDistinct distinct values — ranks are " +
          "bounded only for discrete score domains; bucketize first")
      require(probe.length >= 2,
        s"spearman: '$c' is constant — zero rank variance, ρ undefined")
      val dist = df.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c"))
      val (cum, _) = PrefixSum.runningSum(dist, "__v", "__c", "__cum")
      cum.select(col("__v"),
        (lit(2L) * (col("__cum") - col("__c")) + col("__c") + lit(1L))
          .as("__r2"))
    }
    val rx = rank2(xCol).select(col("__v").as("__vx"), col("__r2").as("__rx"))
    val ry = rank2(yCol).select(col("__v").as("__vy"), col("__r2").as("__ry"))
    val d38 = DecimalType(38, 0)
    df.join(broadcast(rx), df(xCol) === col("__vx"))
      .join(broadcast(ry), df(yCol) === col("__vy"))
      .agg(
        count(lit(1)).cast(d38).as("__n"),
        sum(col("__rx").cast(d38)).as("__sx"),
        sum(col("__ry").cast(d38)).as("__sy"),
        sum((col("__rx") * col("__rx")).cast(d38)).as("__sxx"),
        sum((col("__ry") * col("__ry")).cast(d38)).as("__syy"),
        sum((col("__rx") * col("__ry")).cast(d38)).as("__sxy"))
      .select(col("__n").cast("long").as("n"),
        ((col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
          (sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")) *
            sqrt((col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double"))))
          .as("spearman_rho"))
  }
}
