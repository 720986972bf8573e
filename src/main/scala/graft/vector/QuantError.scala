package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Quantization-distortion audit: what the SQ8 storage path COSTS per
  * vector, as exact integers — the acceptance check that pairs with
  * `ivf_recall_audit` (recall audits the INDEX approximation, this audits
  * the STORAGE approximation; together they bound the serving error).
  *
  * Exactness: the float vector is first mapped to the repo's 10⁴ reference
  * grid (qx = ⌊x·10⁴⌋, the quantization pattern from `queries/Dsl.scala`),
  * then SQ8-coded against the per-vector max: code = (127·qx) div M,
  * reconstruction r = (code·M) div 127 — all longs with truncating
  * division, so err = Σ(qx−r)² and energy = Σqx² are order-free exact and
  * the per-vector distortion (10⁶·err) div energy hash-matches DuckDB.
  *
  * Scale: one map-only projection (row-local array folds, no explode, no
  * shuffle) + a DECIMAL(38,0) global aggregate + a TakeOrdered worst-K
  * shortlist. Long bounds: per-vector err ≤ d·(M div 127 + 1)² ≤ ~10⁶·d,
  * far inside long; the GLOBAL sums cross 2⁶³ near n ≈ 10⁹ rows (energy
  * ~ d·10⁸ each), so totals aggregate in DECIMAL(38,0).
  */
object QuantError {

  /** Worst-`topK` vectors by SQ8 distortion ppm, each row also carrying the
    * corpus-wide `global_ppm` (computed from untruncated totals, broadcast
    * as a 1-row frame). Vectors whose 10⁴-grid image is all-zero carry no
    * signal either way and are excluded (mx > 0), mirroring the
    * `sq8_cosine_topk` ingest filter.
    */
  def sq8Distortion(df: DataFrame, idCol: String, vecCol: String,
                    topK: Int): DataFrame = {
    val per = df.select(col(idCol).as("vec_id"),
        expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
          .as("q"))
      .withColumn("mx", expr("array_max(transform(q, x -> abs(x)))"))
      .filter(col("mx") > 0)
      .withColumn("dl",
        expr("transform(q, x -> x - (((127 * x) div mx) * mx) div 127)"))
      .withColumn("err",
        expr("aggregate(transform(dl, d -> d * d), 0L, (a, b) -> a + b)"))
      .withColumn("energy",
        expr("aggregate(transform(q, x -> x * x), 0L, (a, b) -> a + b)"))
      .withColumn("dist_ppm", expr("(1000000L * err) div energy"))
      .select(col("vec_id"), col("err"), col("energy"), col("dist_ppm"))
    val tot = broadcast(per.agg(
      sum(col("err").cast(DecimalType(38, 0))).as("__te"),
      sum(col("energy").cast(DecimalType(38, 0))).as("__tn")))
    per.crossJoin(tot)
      .withColumn("global_ppm",
        expr("CAST((1000000 * __te) div __tn AS BIGINT)"))
      .select(col("vec_id"), col("err"), col("energy"), col("dist_ppm"),
        col("global_ppm"))
      .orderBy(desc("dist_ppm"), col("vec_id"))
      .limit(topK)
  }
}
