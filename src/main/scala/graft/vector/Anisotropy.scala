package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space anisotropy audit (Ethayarajh 2019's health check): if
  * random pairs of embeddings already point the same way, cosine scores
  * compress into a narrow band and every downstream threshold (dedup,
  * ANN, SemDeDup) silently loses resolution. The audit number is the mean
  * pairwise dot product relative to the mean self dot — ≈ the expected
  * cosine of a random pair when norms are comparable (reported as a
  * RATIO, not a cosine, because per-pair normalization would need sqrt).
  *
  * The whole audit is ONE distributed pass, no pair enumeration: with
  * quantized components q_i (floor(x·10⁴), the Gram discipline),
  *   Σ_{i<j} q_i·q_j = (|Σ_i q_i|² − Σ_i |q_i|²) / 2
  * — the sum-vector identity turns the O(n²) pair sum into per-dimension
  * sums. Exact integers throughout: per-dim sums are longs, their squares
  * DECIMAL(38,0)/HUGEINT, one truncating division per output.
  *
  * Scale shape: one row-local posexplode (d-fold, no shuffle) into a
  * 64-row grouped aggregation; every later step is arithmetic on the
  * d-row frame. |S_d| ≤ n·2³¹ and S_d² ≤ 4·10³² at n = 10¹² — inside
  * DECIMAL(38,0) with headroom.
  */
object Anisotropy {

  /** One-row frame: n_vectors, mean_self_dot, mean_pair_dot,
    * anisotropy_permille = 1000·mean_pair_dot/mean_self_dot.
    */
  def audit(df: DataFrame, vecCol: String, dim: Int,
            quantScale: Double = 10000.0): DataFrame = {
    val q = df
      .filter(size(col(vecCol)) === dim)
      .select(posexplode(expr(
        s"transform(CAST($vecCol AS ARRAY<DOUBLE>), x -> CAST(floor(x * $quantScale) AS BIGINT))"))
        .as(Seq("d", "v")))
    val perDim = q.groupBy(col("d")).agg(
      sum(col("v")).as("sd"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("sq"),
      count(lit(1)).as("n"))
    perDim.agg(
      max(col("n")).as("n_vectors"),
      sum(expr("CAST(sd AS DECIMAL(38,0)) * sd")).as("__s2"),
      sum(col("sq")).as("__self"))
      .select(col("n_vectors"),
        expr("__self div n_vectors").as("mean_self_dot"),
        expr("(__s2 - __self) div (CAST(n_vectors AS DECIMAL(38,0)) * (n_vectors - 1))")
          .as("mean_pair_dot"),
        expr("(1000 * (__s2 - __self)) div ((n_vectors - 1) * __self)")
          .as("anisotropy_permille"))
  }
}
