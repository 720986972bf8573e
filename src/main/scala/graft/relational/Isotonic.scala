package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Isotonic calibration — pool-adjacent-violators (Zadrozny & Elkan 2002)
  * WITHOUT the sequential stack fold: the PAV solution has the minimax
  * closed form iso(i) = max_{j≤i} min_{k≥i} rate(j..k), which is
  * DISTRIBUTIVELY computable — segment rates from two prefix sums, a
  * per-j suffix-min window over k, one grouped max per i. O(B²) rows for
  * B score bins, never a driver recurrence, and every intermediate is a
  * truncating-permille integer: floor is monotone, so
  * max-min of floored segment rates equals the floor of PAV's exact
  * pooled rate — the closed form survives the integer discipline intact.
  *
  * Contract: the SCORE domain must be bounded (`maxBins`, loud probe —
  * the QuantileRank class); callers with continuous scores bucketize
  * first. The B-row prefix window runs on the bounded bin frame, not the
  * corpus; the B²/2 segment frame is the only quadratic and it is
  * bin-quadratic, not row-quadratic.
  */
object Isotonic {

  /** Per observed score bin, ascending: (score, n, n_pos, raw_permille,
    * iso_permille) with iso_permille the isotonic (non-decreasing)
    * calibrated positive rate. */
  def pavCalibration(df: DataFrame, scoreCol: String, isPositive:
      org.apache.spark.sql.Column, maxBins: Int = 4096): DataFrame = {
    val bins = df.groupBy(col(scoreCol).cast("long").as("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(isPositive, 1L).otherwise(0L)).as("np"))
    val probe = bins.select(col("s")).limit(maxBins + 1).collect()
    require(probe.length <= maxBins,
      s"pavCalibration: > $maxBins score bins — bucketize the score " +
        "first (the bounded-domain contract)")
    require(!probe.exists(_.isNullAt(0)),
      "pavCalibration: NULL scores — filter or impute first")
    // bounded-bin prefix sums (B ≤ maxBins rows — the answer-sized-window
    // class, enforced by the probe above)
    val wPre = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val pre = bins
      .withColumn("cn", sum(col("n")).over(wPre))
      .withColumn("cp", sum(col("np")).over(wPre))
    val segs = pre.select(col("s").as("j"), col("cn").as("cnk"),
      col("cp").as("cpk"))
      .crossJoin(broadcast(pre.select(col("s").as("jj"),
        (col("cn") - col("n")).as("cn0"), (col("cp") - col("np")).as("cp0"))))
      .filter(col("jj") <= col("j"))
      .select(col("jj").as("j"), col("j").as("k"),
        expr("(1000L * (cpk - cp0)) div (cnk - cn0)").as("perm"))
    // suffix min over k per j, evaluated AT k = i
    val wSuf = Window.partitionBy(col("j")).orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val iso = segs.withColumn("msuf", min(col("perm")).over(wSuf))
      .groupBy(col("k").as("s"))
      .agg(max(col("msuf")).as("iso_permille"))
    bins.join(iso, Seq("s"))
      .select(col("s").as(scoreCol), col("n"), col("np").as("n_pos"),
        expr("(1000L * np) div n").as("raw_permille"), col("iso_permille"))
      .orderBy(col(scoreCol))
  }
}
