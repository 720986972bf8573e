package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Spearman rank correlation between two discrete signals (Spearman 1904) —
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
  * Scale: per signal, ONE map-side-combined value-count aggregation whose
  * output is contractually ≤ `maxDistinct` rows (integral discrete score
  * domains — the [[QuantileRank]] bounded-domain contract, enforced by a
  * `limit(cap+1)` bounded collect with a loud require). The doubled ranks
  * are a driver-side prefix over that bounded table (the bounded-model
  * class, like the BPE argmax), broadcast back as literal frames; one
  * aggregate emits the single row. Three jobs total — an earlier
  * PrefixSum-based variant spent 4× the wall-clock on fixed per-job
  * overhead for identical output.
  */
object Correlation {

  /** One-row frame: (n, spearman_rho). Both columns must be integral
    * (discrete scores — bucketize first otherwise), non-null,
    * ≤ `maxDistinct` distinct values, and non-constant (a constant signal
    * has zero rank variance — ρ is undefined; fails loudly rather than
    * emitting NaN).
    */
  def spearman(df0: DataFrame, xCol: String, yCol: String,
               maxDistinct: Int = 200000): DataFrame = {
    val spark = df0.sparkSession
    import spark.implicits._
    Seq(xCol, yCol).foreach { c =>
      val dt = df0.schema(c).dataType
      val integral = dt == ByteType || dt == ShortType ||
        dt == IntegerType || dt == LongType
      require(integral,
        s"spearman: '$c' must be an integral discrete score column " +
          s"(got $dt) — ranks over a continuous domain are data-sized; " +
          "bucketize first")
    }
    // the signal frame feeds three consumers; land the two-column
    // projection so an expensive derivation (tokenizing text) runs once
    val df = Stages.materialize(
      df0.select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y")), "spearman_signals")
    def rank2(c: String): DataFrame = {
      val rows = df.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c"))
        .limit(maxDistinct + 1).collect()
      require(!rows.exists(_.isNullAt(0)),
        s"spearman: '$c' contains NULLs — a NULL has no rank; filter or " +
          "impute first")
      require(rows.length <= maxDistinct,
        s"spearman: '$c' has > $maxDistinct distinct values — ranks are " +
          "bounded only for discrete score domains; bucketize first")
      require(rows.length >= 2,
        s"spearman: '$c' is constant — zero rank variance, ρ undefined")
      val sorted = rows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var below = 0L
      val ranked = sorted.map { case (v, cnt) =>
        val r2 = 2L * below + cnt + 1L
        below += cnt
        (v, r2)
      }
      broadcast(ranked.toSeq.toDF("__v", "__r2"))
    }
    val rx = rank2("__x").select(col("__v").as("__vx"), col("__r2").as("__rx"))
    val ry = rank2("__y").select(col("__v").as("__vy"), col("__r2").as("__ry"))
    val d38 = DecimalType(38, 0)
    df.join(rx, col("__x") === col("__vx"))
      .join(ry, col("__y") === col("__vy"))
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
