package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact quantized Gram matrix G[i,j] = Σ_rows v_i·v_j over an embedding
  * column — the sufficient statistic every spectral feature audit starts
  * from: PCA/whitening consumes G (covariance = (n·G − s·sᵀ)/n², with the
  * per-dim sums s the [[Dispersion]] family already produces), redundant /
  * dead dimensions show up as off-diagonal mass / zero diagonal, and
  * feature-correlation heat maps are G rescaled.
  *
  * Shape — the canonical distributed Gram: the d(d+1)/2 upper-triangle
  * partial products are formed ROW-LOCALLY (a nested HOF over the quantized
  * vector — no join, no posexplode self-join whose n·d shuffle would
  * dominate), then one aggregation whose map-side combine collapses each
  * partition to ≤ d²/2 partial rows before the only shuffle. Traffic is
  * partitions·d², independent of row count — the shape that survives 100 TB.
  *
  * Exactness: components quantize to floor(x·quantScale) longs (the Dsl
  * quantization rule); products sum in DECIMAL(38,0), so any engine
  * reproduces the integers bit-for-bit. Bound: |G| ≤ n·Q² — inside 38
  * digits for n ≲ 10³⁰ at Q = 10⁴ (no realistic limit).
  */
object Gram {

  /** Upper-triangle (dim_i ≤ dim_j, 0-based) exact Gram entries:
    * (dim_i, dim_j, gram) as decimal strings plus the row count `n`.
    */
  def upperTriangle(df: DataFrame, vecCol: String,
                    quantScale: Double = 10000.0): DataFrame = {
    val q = transform(col(vecCol), x =>
      floor(x.cast("double") * lit(quantScale)).cast("long"))
    // struct(i, j, xi*xj) per upper-triangle cell, built in one nested
    // transform: the outer index i is 0-based; the inner slice starts at
    // the SAME element (1-based position i+1), so j = i + inner offset
    val cells = df.select(
      explode(flatten(transform(q, (xi, i) =>
        transform(slice(q, i + lit(1), size(q) - i),
          (xj, jo) => struct(i.as("di"), (i + jo).as("dj"),
            (xi * xj).cast(DecimalType(38, 0)).as("p"))))))
        .as("c"))
    cells
      .groupBy(col("c.di").cast("long").as("dim_i"),
        col("c.dj").cast("long").as("dim_j"))
      .agg(sum(col("c.p")).as("__g"), count(lit(1)).as("n"))
      .select(col("dim_i"), col("dim_j"), col("n"),
        col("__g").cast("string").as("gram"))
  }
}
