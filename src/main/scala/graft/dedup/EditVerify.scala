package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Block-and-verify edit-distance similarity — the VERIFY stage of entity
  * resolution / near-dup review: candidate pairs from a cheap equi-join
  * blocker are scored with exact Levenshtein similarity, the number a
  * human reviewer or a keep/drop rule can defend. The library's gated
  * MinHash/SimHash rows find set-similar pairs; edit similarity answers
  * the stricter "is one a light edit of the other?" — transposition-heavy
  * spam and template fills score differently under the two, which is
  * exactly why pipelines run both.
  *
  * Determinism: Levenshtein is an exact integer DP with one standard
  * definition (unit insert/delete/substitute) — engine-identical;
  * similarity is truncating permille of (maxLen − dist)/maxLen over the
  * verification window.
  *
  * Scale: blocking is a plain equi-join on the prefix key (shuffle,
  * co-partitioned) — NEVER all-pairs; the quadratic hazard is a hot block
  * (shared boilerplate prefix), guarded loudly by `maxBlockSize` exactly
  * like [[graft.relational.FrequentPairs]]' basket cap. Verification cost
  * is O(window²) per CANDIDATE, bounded by `verifyWindow` (beyond a few
  * kchars, edit distance adds no discrimination a reviewer cares about —
  * and an unbounded window would make one giant doc pair a straggler).
  * Swap the blocker for the gated LSH band keys to scale recall; this
  * operator is the verify stage appended to ANY blocker.
  */
object EditVerify {

  /** (id1, id2, dist, max_len, sim_permille) for distinct doc pairs
    * sharing their first `blockPrefix` characters, id1 < id2.
    */
  def blockedEditSimilarity(docs: DataFrame, idCol: String, textCol: String,
                            blockPrefix: Int = 40, verifyWindow: Int = 2000,
                            maxBlockSize: Int = 1000): DataFrame = {
    require(blockPrefix >= 1 && verifyWindow >= blockPrefix)
    val b = graft.relational.Stages.materialize(
      docs.select(col(idCol).as("__id"),
        substring(col(textCol), 1, blockPrefix).as("__blk"),
        substring(col(textCol), 1, verifyWindow).as("__t"))
        .filter(col("__id").isNotNull && col("__blk").isNotNull),
      "editverify_blocks")
    val biggest = b.groupBy(col("__blk")).agg(count(lit(1)).as("k"))
      .agg(max(col("k"))).head()
    if (!biggest.isNullAt(0)) {
      require(biggest.getLong(0) <= maxBlockSize,
        s"blockedEditSimilarity: a block holds ${biggest.getLong(0)} docs " +
          s"> maxBlockSize=$maxBlockSize — a shared boilerplate prefix " +
          "would emit O(k²) pairs; use a sharper blocking key")
    }
    b.as("l").join(b.as("r"),
      col("l.__blk") === col("r.__blk") && col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id1"), col("r.__id").as("id2"),
        levenshtein(col("l.__t"), col("r.__t")).cast("long").as("dist"),
        greatest(length(col("l.__t")), length(col("r.__t"))).cast("long")
          .as("max_len"))
      .withColumn("sim_permille",
        when(col("max_len") === 0, 1000L)
          .otherwise(expr("(1000L * (max_len - dist)) div max_len")))
  }
}
