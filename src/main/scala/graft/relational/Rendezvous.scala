package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions.md5Bits60

/** Rendezvous (highest-random-weight) shard assignment and the
  * shard-count-change migration audit (Thaler & Ravishankar 1996) — the
  * data-layout pre-flight for resharding a keyed store or stream: when the
  * shard count changes S → S', HRW moves only the keys whose argmax shard
  * changed (expected fraction 1 − S/S' on growth, vs ~1 − 1/S' for mod-N),
  * and this operator measures the ACTUAL movement matrix before anyone
  * touches data.
  *
  * Portability: the per-(key, shard) weight is the house md5-prefix 60-bit
  * key ([[graft.functions.Md5Bits60]]) of `key || ':' || shard` — the
  * assignment an oracle replays byte-identically, so shard ids are safe in
  * oracle-compared values. The argmax is folded into ONE integer:
  * combined = (w div 16)·16 + s; greatest(combined) mod 16 is the winning
  * shard (56 effective weight bits; ties — a 56-bit digest collision
  * BETWEEN two shards of one key — break to the higher shard id, and
  * identically so in any engine evaluating the same expression).
  *
  * Scale: the assignment is a stateless per-row expression — S + S'
  * codegen'd digests, NO explode, NO shuffle, NO state; at 100 TB it rides
  * the scan. The audit aggregation is movement-matrix-bounded (≤ S·S'
  * rows), and the share denominator is a 1-row broadcast.
  */
object Rendezvous {

  /** HRW shard of `key` (any type; cast to its string form) among
    * `0 until nShards`. nShards ≤ 16 so the shard id packs into the low
    * 4 bits of the combined argmax integer.
    */
  def shardOf(key: Column, nShards: Int): Column = {
    require(nShards >= 2 && nShards <= 16,
      s"rendezvous: nShards must be in [2, 16] (got $nShards) — the " +
        "combined-argmax encoding packs the shard id into 4 bits")
    val combos = (0 until nShards).map { s =>
      // (w div 16)·16 + s, in exact long arithmetic (a double-division
      // detour would round above 2⁵³): shifts, since w ≥ 0 always
      shiftleft(shiftright(md5Bits60(
        concat(key.cast("string"), lit(s":$s"))), 4), 4) + lit(s.toLong)
    }
    greatest(combos: _*) % lit(16L)
  }

  /** Movement matrix for resharding `keyCol` from `fromShards` to
    * `toShards`: one row per observed (shard_old, shard_new) with the key
    * count, a moved flag, and the exact permille share of all keys.
    * Duplicate keys are collapsed first (a key is assigned once, however
    * many rows carry it).
    */
  def rebalanceMatrix(df: DataFrame, keyCol: String,
                      fromShards: Int, toShards: Int): DataFrame = {
    val keys = df.select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull).distinct()
    val matrix = keys
      .select(shardOf(col("__k"), fromShards).as("shard_old"),
        shardOf(col("__k"), toShards).as("shard_new"))
      .groupBy(col("shard_old"), col("shard_new"))
      .agg(count(lit(1)).as("n_keys"))
    val total = matrix.agg(sum(col("n_keys")).as("__t"))
    matrix.crossJoin(broadcast(total))
      .select(col("shard_old"), col("shard_new"), col("n_keys"),
        (col("shard_old") =!= col("shard_new")).cast("boolean").as("moved"),
        expr("(1000L * n_keys) div __t").as("share_permille"))
  }
}
