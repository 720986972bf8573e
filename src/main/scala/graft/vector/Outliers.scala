package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-class embedding outlier detection — the mislabeled/noise filter over
  * an embedded corpus: for each labeled class, rank vectors by squared
  * distance to the CLASS CENTROID and surface the farthest (candidate
  * label errors / out-of-distribution rows, the "confident learning"
  * pre-filter shape).
  *
  * Exactness without FP drift: the centroid is never materialized as a
  * float. With quantized components qv = floor(x·10⁴) and per-(label,dim)
  * integer sums S and counts n, the n²-scaled squared distance
  * Σ_d (n·qv − S)² is EXACT integer math, identical in any engine and any
  * partition order — monotone in the true distance-to-centroid, so ranks
  * and threshold verdicts match the float computation. Magnitudes:
  * |qv| ≤ 5.3e3, n ≤ 10⁵ per class ⇒ term ≤ (1.06e9)²·64 ≈ 7e19 — beyond
  * long, so the square-and-sum runs in DECIMAL(38,0) (exact to 10³⁸) and
  * only the final dist2n narrows to long, failing loudly under ANSI if a
  * class is so large the total itself exceeds 2⁶³ (the same representable
  * bound the oracle's CAST AS BIGINT enforces). The class-level mean
  * compare likewise runs in DECIMAL(38,0).
  *
  * Scale design: one explode (n·dim rows, map-side), one (label,dim)
  * aggregation (dim-bounded result — broadcastable), one join back
  * (broadcast: |labels|·dim rows), one (label,id) aggregation riding the
  * same shuffle key family, then a bounded-heap top-k (no global window).
  */
object Outliers {

  /** Top-`topK` farthest-from-centroid vectors per label:
    * (label, vec_id, dist2n, ratio_permille) — dist2n is the n²-scaled
    * integer distance (comparable WITHIN a label); ratio_permille is
    * 1000·dist2n·n / Σdist2n, the distance-to-class-mean ratio as an exact
    * integer division (a boolean k×-mean flag would be degenerate on
    * concentrated high-dim embeddings — the ratio keeps the signal, and
    * callers threshold it per corpus).
    */
  def perClassOutliers(df: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, topK: Int,
                       quantScale: Double = 10000.0,
                       maxClasses: Int = 1024): DataFrame = {
    require(topK > 0)
    // bounded-class contract: the (label, dim) sums broadcast — labels must
    // be dimension-like, not key-like (see ClusterQuality scaladoc)
    ClusterQuality.requireBoundedClasses(df, labelCol, maxClasses,
      "perClassOutliers")
    val flat = df.select(
      col(idCol).cast("long").as("id"),
      col(labelCol).cast("long").as("label"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * lit(quantScale)).cast("long"))).as(Seq("dim", "qv")))
    val sums = flat.groupBy("label", "dim")
      .agg(sum("qv").as("s"), count(lit(1)).as("n"))
    // The per-dim term n·qv − S can reach ~1e9 at n≈10⁵; its square ~1e18
    // ×dims overflows long, so square and sum in DECIMAL(38,0) (exact) and
    // only narrow back to long at the end — ANSI makes a genuinely
    // unrepresentable total fail loudly instead of wrapping, the same bound
    // the oracle's CAST(dist2n AS BIGINT) enforces.
    val per = flat.join(broadcast(sums), Seq("label", "dim"))
      .withColumn("t", (col("n") * col("qv") - col("s")).cast(DecimalType(38, 0)))
      .groupBy("label", "id")
      .agg(sum(col("t") * col("t")).as("__d2"))
      .withColumn("dist2n", col("__d2").cast("long")).drop("__d2")
    val lab = per.groupBy("label")
      .agg(sum(col("dist2n").cast(DecimalType(38, 0))).as("tot"),
        count(lit(1)).as("nl"))
    val scored = per.join(broadcast(lab), Seq("label"))
      // a degenerate class (every vector identical) has tot = 0 — all
      // points sit ON the centroid, so the ratio is 0, not an ANSI
      // divide-by-zero crash
      .withColumn("ratio_permille",
        when(col("tot") === 0, lit(0L))
          .otherwise(expr("(1000 * CAST(dist2n AS DECIMAL(38,0)) * nl) div tot")))
      .select(col("label"), col("id").as("vec_id"), col("dist2n"),
        col("ratio_permille"))
    graft.relational.TopK.perGroup(scored, Seq("label"),
      Seq(("dist2n", false), ("vec_id", true)), topK)
  }
}
