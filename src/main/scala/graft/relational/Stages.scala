package graft.relational

import org.apache.spark.sql.{Column, DataFrame}

/** Plan-level stage sharing WITHOUT caching.
  *
  * A multi-stage pipeline that references each stage's output more than once
  * (quota sampling reads its input three times: group counts, rank
  * membership, final join; a two-phase prefix sum reads twice) multiplies
  * the UPSTREAM subtree into every reference — compose three such stages and
  * the source table is scanned ~2×3×3 times in one plan. Caching the stage
  * would fix it but pins a corpus-sized frame with no unpersist point (the
  * composed query is lazy), which is exactly the cache-lifecycle hazard this
  * engine avoids.
  *
  * [[anchor]] instead ends the stage at an explicit hash-partition
  * `Exchange`. Catalyst's `ReuseExchange` rule (and AQE's stage reuse)
  * dedups IDENTICAL exchange subtrees within a plan, so every downstream
  * reference re-reads the one materialized shuffle instead of recomputing
  * the stage: the stage runs once, costs one extra shuffle of its own
  * (answer-sized) output, holds no storage beyond normal shuffle files, and
  * stays lineage-safe under executor loss (shuffle blocks re-derive from the
  * deterministic hash partitioning — unlike `localCheckpoint`).
  *
  * Use it at stage BOUNDARIES whose upstream is expensive and whose output
  * is consumed more than once. Don't bother when the input is a bare table
  * scan — a scan re-read is cheaper than a shuffle — or when the consumer
  * count is one.
  */
object Stages {
  def anchor(df: DataFrame, key: Column): DataFrame = df.repartition(key)
}
