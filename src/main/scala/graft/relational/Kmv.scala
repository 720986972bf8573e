package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-minimum-values distinct-count sketch with its own accuracy audit
  * (Bar-Yossef et al. 2002; the KMV/bottom-k estimator of Beyer et al.
  * 2007) — the PORTABLE member of the cardinality family: where
  * `approx_distinct_users` rides Spark's built-in HLL++ (opaque binary
  * state, engine-specific), KMV's entire state is "the k smallest 60-bit
  * md5 values" — replayable in any engine, mergeable by construction
  * (the k smallest of a union are among the union of k-smallests, so
  * shards combine with one more heap pass), and its estimate
  * (k−1)·2⁶⁰ div h₍ₖ₎ is one integer division.
  *
  * Exactness: hashes are the house md5-prefix 60-bit keys; the k-th
  * minimum is rank-selected, the estimate is truncating DECIMAL(38,0)
  * arithmetic ((k−1)·2⁶⁰ ≈ 7·10¹⁹ crosses 2⁶³), and the audit's exact
  * side counts DISTINCT HASHES — the same domain the sketch sees, so
  * estimate and truth are apples to apples (a 60-bit collision, P ≈
  * n²/2⁶¹, would shift both sides together).
  *
  * Scale: one distinct aggregation on (group, hash) — map-side combined —
  * then [[TopK]]'s bounded heaps keep k candidates per partition, so the
  * final shuffle carries ≤ k·partitions rows per group however large the
  * corpus; groups with < k distinct values report exactly.
  */
object Kmv {

  /** Per-group frame (group, exact_distinct, kth_min, kmv_estimate,
    * err_permille) — the estimate beside the exact count and its signed
    * truncating-permille error, group order. */
  def distinctAudit(df: DataFrame, groupCol: String, idCol: String,
                    k: Int = 64): DataFrame = {
    require(k >= 16 && k <= 4096,
      s"kmv: k=$k outside 16..4096 — below 16 the estimate is folklore, " +
        "above 4096 use the exact distinct")
    val hashed = Stages.materialize(
      df.select(col(groupCol).as("g"),
        graft.functions.HashFunctions.md5Bits60(
          col(idCol).cast("string")).as("h")).distinct(),
      "kmv_hashes")
    val kth = TopK.perGroup(hashed, Seq("g"), Seq(("h", true)), k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("__m"), max(col("h")).as("kth_min"))
    val exact = hashed.groupBy(col("g"))
      .agg(count(lit(1)).as("exact_distinct"))
    exact.join(kth, Seq("g"))
      .select(col("g").as(groupCol), col("exact_distinct"), col("kth_min"),
        when(col("__m") < k, col("__m"))
          .otherwise(expr(
            s"(CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976L) div kth_min"))
          .as("kmv_estimate"))
      .withColumn("err_permille",
        expr("(1000L * (kmv_estimate - exact_distinct)) div exact_distinct"))
      .orderBy(col(groupCol))
  }

  /** Shard-merge audit — the distributed-sketch algebra under the gate:
    * split each group's rows into `shards` portable cells (md5-hash mod
    * shards, so the split itself is engine-replayable), sketch every
    * shard independently, MERGE (one more bottom-k pass over the
    * ≤ shards·k candidates), and report the merged sketch beside the
    * direct whole-group sketch. For bottom-k the identity is exact —
    * the k smallest of a union are among the union of per-shard
    * k-smallests — so `merge_exact` must be TRUE on every row; emitting
    * the audited equality (rather than asserting it in a spec alone)
    * pins the property the 1000-shard production merge relies on.
    *
    * Scale: per-shard sketches shuffle ≤ k·partitions rows per (group,
    * shard); the merge input is shards·k rows per group — answer-sized.
    */
  def mergeAudit(df: DataFrame, groupCol: String, idCol: String,
                 k: Int = 64, shards: Int = 4): DataFrame = {
    require(k >= 16 && k <= 4096, s"kmv: k=$k outside 16..4096")
    require(shards >= 2 && shards <= 64,
      s"mergeAudit: shards=$shards outside 2..64")
    val hashed = Stages.materialize(
      df.select(col(groupCol).as("g"),
        graft.functions.HashFunctions.md5Bits60(
          col(idCol).cast("string")).as("h")).distinct(),
      "kmv_merge_hashes")
    val sharded = hashed.withColumn("shard", pmod(col("h"), lit(shards.toLong)))
    val perShard = TopK.perGroup(sharded, Seq("g", "shard"),
      Seq(("h", true)), k)
    val merged = TopK.perGroup(perShard.select(col("g"), col("h")),
      Seq("g"), Seq(("h", true)), k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("m_merged"), max(col("h")).as("kth_merged"))
    val direct = TopK.perGroup(hashed, Seq("g"), Seq(("h", true)), k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("m_direct"), max(col("h")).as("kth_direct"))
    direct.join(merged, Seq("g"))
      .select(col("g").as(groupCol),
        col("m_direct"), col("kth_direct"), col("kth_merged"),
        (col("m_merged") === col("m_direct") &&
          col("kth_merged") === col("kth_direct")).as("merge_exact"),
        when(col("m_direct") < k, col("m_direct"))
          .otherwise(expr(
            s"(CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976L) div kth_merged"))
          .as("kmv_estimate"))
      .orderBy(col(groupCol))
  }
}
