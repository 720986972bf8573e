package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-space monitoring WITHOUT pairwise joins — both views ride the
  * same sums-of-squares identity the silhouette audit uses
  * (Σ_{i<j} d²(i,j) = Σ_d [n·Q_d − S_d²] with per-dim integer sums S and
  * squared-sums Q over quantized components):
  *
  *   - per-group DISPERSION: total pairwise squared distance — the
  *     diversity measure behind "did dedup collapse this source's
  *     embedding space?"; a shrinking dispersion at constant n is mode
  *     collapse.
  *   - batch DRIFT: squared distance between two batches' mean vectors
  *     (n²-scaled like [[Outliers]]) — "did the new crawl move the
  *     embedding distribution?" without materializing float centroids.
  *
  * Scale: one explode + one (group, dim) aggregation (dims-bounded,
  * broadcastable result) each; DECIMAL(38,0) where squares exceed long
  * (S_d ≈ n·qv can reach 5e8·5e3; S² ≈ 7e23). All values exact integers —
  * hash-portable.
  */
object Dispersion {

  /** (group, n, dispersion) with dispersion = Σ_d (n·Q_d − S_d²), the
    * total pairwise squared distance ×2. Emitted as a STRING: the exact
    * value exceeds long (it lives in DECIMAL(38,0) / DuckDB HUGEINT), and
    * only the decimal-string rendering round-trips both engines' clients
    * without a lossy float cast.
    */
  def perGroup(df: DataFrame, groupCol: String, vecCol: String,
               quantScale: Double = 10000.0): DataFrame = {
    val flat = df.select(col(groupCol).as("grp"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * lit(quantScale)).cast("long"))).as(Seq("dim", "qv")))
    val sums = flat.groupBy(col("grp"), col("dim"))
      .agg(sum(col("qv")).cast(DecimalType(38, 0)).as("s"),
        sum((col("qv") * col("qv")).cast(DecimalType(38, 0))).as("q2"),
        count(lit(1)).as("n"))
    sums.groupBy(col("grp").as(groupCol))
      .agg(max(col("n")).as("n"),
        sum(col("n") * col("q2") - col("s") * col("s")).as("__disp"))
      .withColumn("dispersion", col("__disp").cast("string"))
      .drop("__disp")
  }

  /** Mean-vector drift between two halves of a keyed frame: one row —
    * (n_first, n_second, shift2_scaled) where shift2_scaled is the
    * (n₁·n₂)²-scaled squared distance between the halves' mean vectors:
    * Σ_d (n₂·S1_d − n₁·S2_d)², exact in DECIMAL(38,0), emitted as string.
    * `isFirst` labels the "old" half (e.g. id below the median).
    */
  def halfDrift(df: DataFrame, vecCol: String,
                isFirst: org.apache.spark.sql.Column,
                quantScale: Double = 10000.0): DataFrame = {
    val flat = df.select(isFirst.as("h1"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * lit(quantScale)).cast("long"))).as(Seq("dim", "qv")))
    val sums = flat.groupBy(col("dim"))
      .agg(sum(when(col("h1"), col("qv")).otherwise(0L))
          .cast(DecimalType(38, 0)).as("s1"),
        sum(when(!col("h1"), col("qv")).otherwise(0L))
          .cast(DecimalType(38, 0)).as("s2"),
        sum(when(col("h1"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("h1"), 1L).otherwise(0L)).as("n2"))
    sums.agg(
      max(col("n1")).as("n_first"),
      max(col("n2")).as("n_second"),
      sum((col("n2") * col("s1") - col("n1") * col("s2")) *
        (col("n2") * col("s1") - col("n1") * col("s2"))).as("__sh"))
      .withColumn("shift2_scaled", col("__sh").cast("string"))
      .drop("__sh")
  }
}
