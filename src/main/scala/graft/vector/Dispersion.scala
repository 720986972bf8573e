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
  *
  * EXACTNESS BOUNDS: with |component|·quantScale ≤ Q and d dims,
  * [[perGroup]]'s per-dim n·Q₂−S² term is ≤ n²·Q², so the summed
  * dispersion stays inside DECIMAL(38,0) for n ≲ 10¹⁷/(Q·√d) (Q = 10⁴,
  * d = 64: n ≲ 1.2e12 rows/group — beyond any real group; past it Spark
  * ANSI throws loudly, never silently wrong). [[halfDrift]] SQUARES the
  * cross term n₂S₁−n₁S₂ ≤ 2n₁n₂Q, which would cap a decimal plan at
  * n₁n₂ ≲ 6e14/√d (~8.7e6 rows per half at Q = 10⁴, d = 64) — far too
  * small for batch monitoring — so its squaring runs driver-side in
  * BigInt over the dims-bounded sums frame instead: exact at any n.
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
      .agg(max(col("n")).as("n"), min(col("n")).as("__nmin"),
        sum(col("n") * col("q2") - col("s") * col("s")).as("__disp"))
      // ragged-dims guard INSIDE the surviving output expression: a group
      // whose vectors differ in length has per-dim counts that disagree,
      // and the identity (and the reported n) would be silently wrong; a
      // dropped assert column would be pruned away, this one cannot be
      .withColumn("dispersion",
        when(col("__nmin") =!= col("n"), raise_error(concat(
          lit("Dispersion.perGroup: ragged vector dims in group "),
          col(groupCol).cast("string"),
          lit(" — per-dim counts range "), col("__nmin").cast("string"),
          lit(".."), col("n").cast("string"),
          lit("; the sums identity needs uniform dims (pad or filter first)"))))
          .otherwise(col("__disp").cast("string")))
      .drop("__disp", "__nmin")
  }

  /** Mean-vector drift between two halves of a keyed frame: one row —
    * (n_first, n_second, shift2_scaled) where shift2_scaled is the
    * (n₁·n₂)²-scaled squared distance between the halves' mean vectors:
    * Σ_d (n₂·S1_d − n₁·S2_d)², emitted as an exact decimal string.
    * `isFirst` labels the "old" half (e.g. id below the median).
    *
    * The distributed pass stops at the per-dim sums (each |S| ≤ n·Q — far
    * inside DECIMAL(38,0)); the cross-term SQUARING, whose 38-digit limit
    * would otherwise cap the operator at n₁n₂ ≲ 6e14/√d (see the object
    * scaladoc), runs on the driver in arbitrary-precision BigInt over the
    * collected DIMS-SIZED frame — the bounded-model-collect class, capped
    * by `maxDims`. Exact at ANY batch size; the DuckDB oracle replay still
    * squares in HUGEINT and keeps its ~1.7e38 ceiling, which test scales
    * sit far below.
    */
  def halfDrift(df: DataFrame, vecCol: String,
                isFirst: org.apache.spark.sql.Column,
                quantScale: Double = 10000.0, maxDims: Int = 65536): DataFrame = {
    val spark = df.sparkSession
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
    val rows = sums.limit(maxDims + 1).collect()
    require(rows.length <= maxDims,
      s"halfDrift: > $maxDims vector dims — the driver-side exact " +
        "reduction collects the per-dim sums frame, which must stay " +
        "dims-bounded (or raise maxDims deliberately)")
    import spark.implicits._
    if (rows.isEmpty) {
      // aggregate-over-empty parity with the old single-agg plan (and the
      // DuckDB replay): one all-NULL row
      return spark.sql(
        "SELECT CAST(NULL AS BIGINT) AS n_first, CAST(NULL AS BIGINT) AS n_second, CAST(NULL AS STRING) AS shift2_scaled")
    }
    val n1s = rows.map(_.getLong(3)).distinct
    val n2s = rows.map(_.getLong(4)).distinct
    require(n1s.length == 1 && n2s.length == 1,
      s"halfDrift: ragged vector dims — per-dim half-counts disagree " +
        s"(n1 in ${n1s.sorted.take(3).mkString(",")}…, " +
        s"n2 in ${n2s.sorted.take(3).mkString(",")}…); the sums identity " +
        "needs uniform dims (pad or filter first)")
    val (n1, n2) = (BigInt(n1s.head), BigInt(n2s.head))
    val shift2 = rows.iterator.map { r =>
      val s1 = BigInt(r.getDecimal(1).toBigInteger)
      val s2 = BigInt(r.getDecimal(2).toBigInteger)
      val cross = n2 * s1 - n1 * s2
      cross * cross
    }.sum
    Seq((n1s.head, n2s.head, shift2.toString))
      .toDF("n_first", "n_second", "shift2_scaled")
  }
}
