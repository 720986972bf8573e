package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew profiler — the pre-flight check for every shuffle-keyed job in
  * this library ("does this key need salting / AQE skew handling?"): per-key
  * frequencies, exact percentile cuts over the frequency distribution, the
  * hottest keys with their uniform-multiple, and the salt factor
  * [[Skew.saltedJoin]] would need to flatten the hottest key to ~uniform.
  *
  * All signals are exact integers: shares and uniform-multiples in permille
  * by integer division, percentiles over integer counts (midpoints exact in
  * double — the repo's quantile rule). The decision this feeds is the one
  * the engine already acts on elsewhere (`salted_join_events`,
  * `salted_agg_events`); this operator makes the DIAGNOSIS a first-class,
  * oracle-checked query instead of tribal knowledge.
  *
  * Scale: one keyed aggregation (map-side combined), one 1-row stats
  * aggregate broadcast back, and a TakeOrderedAndProject for the top-k hot
  * keys — no windows, no joins beyond the 1-row broadcast.
  */
object SkewProfile {

  /** Top-`topK` hottest keys, each row carrying the distribution context:
    * (key, cnt, share_permille, uniform_x_permille, n_keys, total,
    * p50_cnt, p99_cnt, salt_factor). uniform_x_permille = 1000·cnt·n_keys /
    * total (1000 = exactly uniform); salt_factor = ⌈max_cnt·n_keys/total⌉ —
    * the sub-key spread that brings the hottest key back to ~uniform.
    */
  def hotKeys(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    require(topK > 0)
    val perKey = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total"),
      max(col("cnt")).as("__mx"),
      expr("percentile(cnt, 0.5)").as("p50_cnt"),
      expr("percentile(cnt, 0.99)").as("p99_cnt"))
    perKey
      .orderBy(desc("cnt"), col("key")).limit(topK)
      .crossJoin(broadcast(stats))
      // products in DECIMAL(38,0): at the 100 TB scale this pre-flight is
      // FOR (cnt ~1e9 on ~1e8 keys) 1000·cnt·n_keys and __mx·n_keys pass
      // 2^63 and a long plan would ANSI-overflow in the diagnosis itself;
      // `div` (IntegralDivide) takes decimal operands and returns BIGINT,
      // so the emitted schema is unchanged
      .select(col("key"), col("cnt"),
        expr("(1000L * CAST(cnt AS DECIMAL(38,0))) div total").as("share_permille"),
        expr("(1000L * CAST(cnt AS DECIMAL(38,0)) * n_keys) div total")
          .as("uniform_x_permille"),
        col("n_keys"), col("total"), col("p50_cnt"), col("p99_cnt"),
        // ceil division in exact integers: (a + b - 1) div b
        expr("(CAST(__mx AS DECIMAL(38,0)) * n_keys + total - 1L) div total")
          .as("salt_factor"))
  }
}
