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

  /** Cluster-cohesion audit: per multi-member dedup component, the edit
    * similarity of EVERY intra-cluster pair — did the transitive closure
    * glue together documents that are not actually light edits of each
    * other? (The classic failure: A≈B and B≈C chain A and C into one
    * cluster at sim(A,C) ≈ 0, and a canonical-pick then silently drops a
    * distinct document.) The min similarity is the verdict column; a low
    * min flags a chained cluster for review before the drop ships.
    *
    * `labels` is (id, comp) from [[Components.connectedComponents]].
    * Clusters are near-dup-sized (a handful of members); a giant cluster
    * means the threshold is wrong, and the quadratic intra-pair join
    * refuses it loudly via `maxClusterSize` rather than stalling.
    */
  def clusterCohesion(labels: DataFrame, docs: DataFrame, idCol: String,
                      textCol: String, verifyWindow: Int = 2000,
                      maxClusterSize: Int = 1000): DataFrame = {
    val lab = graft.relational.Stages.materialize(
      labels.select(col("id"), col("comp")), "cohesion_labels")
    val biggest = lab.groupBy(col("comp")).agg(count(lit(1)).as("k"))
      .agg(max(col("k"))).head()
    if (!biggest.isNullAt(0)) {
      require(biggest.getLong(0) <= maxClusterSize,
        s"clusterCohesion: a component holds ${biggest.getLong(0)} docs > " +
          s"maxClusterSize=$maxClusterSize — the intra-cluster pair join " +
          "is quadratic per cluster; the dedup threshold is too loose")
    }
    val tx = docs.select(col(idCol).as("__tid"),
      substring(col(textCol), 1, verifyWindow).as("__t"))
    val sims = lab.as("a").join(lab.as("b"),
      col("a.comp") === col("b.comp") && col("a.id") < col("b.id"))
      .select(col("a.comp").as("comp"), col("a.id").as("id1"),
        col("b.id").as("id2"))
      .join(tx.select(col("__tid").as("id1"), col("__t").as("__t1")), Seq("id1"))
      .join(tx.select(col("__tid").as("id2"), col("__t").as("__t2")), Seq("id2"))
      .withColumn("__ml",
        greatest(length(col("__t1")), length(col("__t2"))).cast("long"))
      .withColumn("__sim",
        when(col("__ml") === 0, 1000L)
          .otherwise(expr(
            "(1000L * (__ml - CAST(levenshtein(__t1, __t2) AS BIGINT))) div __ml")))
    sims.groupBy(col("comp"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("__sim")).as("min_sim_permille"),
        sum(col("__sim")).as("__ss"))
      .join(lab.groupBy(col("comp")).agg(count(lit(1)).as("n_members")),
        Seq("comp"))
      .select(col("comp"), col("n_members"), col("n_pairs"),
        col("min_sim_permille"),
        expr("__ss div n_pairs").as("mean_sim_permille"))
  }
}
