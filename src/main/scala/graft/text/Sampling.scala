package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for corpus curation.
  *
  * `DataFrame.sample` draws from a per-partition RNG: results change with
  * partitioning, task retries, and engine — unacceptable for reproducible
  * training-data builds. These operators derive the sampling decision from a
  * content/key hash instead, so a sample is a pure function of the data:
  * re-runs, re-partitions, and other engines (md5 is md5 everywhere) agree
  * row for row. This is the standard "hash-mod sampling" used for stable
  * train/eval splits.
  */
object Sampling {

  /** Uniform keyed sample: keep ≈ `fraction` of rows, decided by the md5 of
    * the key column. Stable under any partitioning and across engines.
    */
  def deterministicSample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    // first 8 hex chars of md5 = 32 uniform bits
    val bucket = conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10).cast("long")
    df.filter(bucket < (fraction * (1L << 32)).toLong)
  }

  /** Stratified fixed-size sample: exactly `perStratum` rows per stratum,
    * chosen by hash order (deterministic, unbiased within stratum). One
    * window pass; no RNG, no state.
    */
  def stratifiedSample(df: DataFrame, stratumCols: Seq[String], keyCol: Column,
                       perStratum: Int): DataFrame = {
    val w = Window.partitionBy(stratumCols.map(col): _*)
      .orderBy(md5(keyCol.cast("string")), keyCol.cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Deterministic train/eval split tag from the key hash: `eval_fraction`
    * of rows get 'eval', the rest 'train' — stable forever, join-free.
    */
  def splitTag(keyCol: Column, evalFraction: Double): Column = {
    val bucket = conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10).cast("long")
    when(bucket < (evalFraction * (1L << 32)).toLong, "eval").otherwise("train")
  }

  /** LEAKAGE-SAFE train/eval split: assign each document so that an entire
    * near-duplicate component lands in ONE split — the [[splitTag]] hash
    * keys on the component id, not the document id, so a pair of near-dups
    * can never straddle train and eval (the eval-contamination failure mode
    * a doc-keyed split has by construction whenever near-dups exist).
    * Components come from [[graft.dedup.Components.connectedComponents]]
    * over the caller's pair set (cosine / MinHash / Jaccard — any edge
    * source); singletons split exactly like a doc-keyed split would (their
    * component id IS their doc id), so the realized eval fraction stays at
    * `evalFraction` up to the duplicated minority.
    *
    * @return (id, comp, split) — one row per node
    */
  def leakageSafeSplit(nodes: DataFrame, idCol: String,
                       pairs: DataFrame, srcCol: String, dstCol: String,
                       evalFraction: Double): DataFrame =
    graft.dedup.Components.connectedComponents(nodes, idCol, pairs, srcCol, dstCol)
      .withColumn("split", splitTag(col("comp"), evalFraction))

  /** Deterministic per-epoch shuffle key: sorting (or range-partitioning)
    * by it yields an epoch-specific pseudorandom training order — a fresh
    * permutation per epoch, reproducible forever, with NO global rank
    * materialized (a trainer range-partitions by the key; a resume
    * re-derives the identical order from the epoch number alone). md5 keeps
    * the permutation engine-portable and seed-auditable.
    */
  def epochShuffleKey(epoch: Int, keyCol: Column): Column =
    md5(concat(lit(s"$epoch:"), keyCol.cast("string")))

  /** Exact-quota source-mix rebalancing: keep the LARGEST dataset whose
    * per-group row counts follow the target `weight` proportions without
    * upsampling any group. The binding group is the one whose rows run out
    * first at its target share; every group's quota derives from it in
    * integer arithmetic (units = n·scale div w, T = min units, quota =
    * T·w div scale — so quota_g ≤ n_g always), and membership within a
    * group is the `quota` smallest md5 ranks — deterministic on any engine,
    * any partitioning.
    *
    * Scale note: the hash-rank needs a per-group total order (one window
    * task per group). Fine for the usual 10s–1000s of sources; for a group
    * too large to sort in one task, switch membership to threshold-rate
    * sampling ([[deterministicSample]] with fraction = quota/n) and accept
    * ±√n count jitter.
    *
    * @param weight integer target-share weight, an expression over
    *               `groupCol`; must be strictly positive for every group
    *               (ANSI `div` raises on zero — by design, a zero-share
    *               group should be filtered out, not silently emptied)
    */
  def quotaMixSample(df: DataFrame, groupCol: String, keyCol: Column,
                     weight: Column, scale: Long = 1000000L): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", weight.cast("long"))
      .withColumn("__units", expr(s"(__n * $scale) div __w"))
    val t = counts.agg(min(col("__units")).as("__t"))
    val quotas = counts.crossJoin(broadcast(t))
      .withColumn("__quota", expr(s"(__t * __w) div $scale"))
      .select(col(groupCol), col("__quota"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(keyCol.cast("string")), keyCol.cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(quotas), groupCol)
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Weight-proportional systematic sample of ≈`k` rows: a row is kept when
    * its weight interval [cw−w, cw) crosses a multiple of total/k on the
    * cumulative-weight axis — the classic systematic (grid) sampler, in pure
    * integer arithmetic (`(cw·k) div total` changes across the row's
    * interval), so it is deterministic on any engine and oracle-exact.
    * Heavier rows are proportionally more likely to straddle a grid line;
    * rows heavier than the step are always kept.
    *
    * The global cumulative sum does NOT use a global-order window (a
    * single-partition scan at 100 TB) — it is a
    * [[graft.relational.PrefixSum.runningSum]] two-phase distributed prefix
    * sum over deterministic id-range buckets: no RangePartitioner sampling,
    * no `localCheckpoint` materialization, lineage-safe.
    *
    * @param weight strictly-positive integer weight column
    */
  def systematicWeightedSample(df: DataFrame, idCol: String, weight: Column,
                               k: Int, numParts: Int = 32): DataFrame = {
    val base = df.withColumn("__w", weight.cast("long"))
    val (summed, total) = graft.relational.PrefixSum.runningSum(
      base, idCol, "__w", "cw", numParts)
    if (total == 0L) summed.where(lit(false)).drop("__w")
    else summed
      // integer `div` (the operator form — Spark registers no div() function):
      // the grid index floor(cw·k / total) changes within the row's interval
      .filter(expr(s"(cw * $k) div $total > ((cw - __w) * $k) div $total"))
      .drop("__w")
  }

  /** Horvitz–Thompson total-estimator audit over the systematic PPS
    * sample — the soundness gate for [[systematicWeightedSample]]: if the
    * sampler's inclusion structure is what it claims (π_i = min(1,
    * k·w_i/W)), then Σ_sample y_i/π_i must reconstruct the CORPUS total
    * of y from k rows, size bias corrected. Auditing with y = 1
    * estimates the row COUNT — the harshest test, since the sample is
    * deliberately size-biased and the correction must undo exactly that.
    *
    * Integer form: contribution_milli = GREATEST(1000·y,
    * (1000·y·W) div (k·w)) — the GREATEST arm is the certainty-unit
    * clamp (k·w ≥ W ⇒ π = 1 ⇒ contribute y itself, not a deflated
    * ratio; getting this clamp BACKWARDS truncates every contribution
    * to y and the estimate collapses to k·y, measured). Signed error
    * permille by one truncating division. The deterministic offset-0
    * grid makes the estimate replayable — the audit measures THIS
    * estimator's error, and the gated row shows it shrinking as k
    * grows (fixture: −101 → −47‰ from k = 10 → 200).
    *
    * Scale: one two-phase prefix sum (no global window), then per k one
    * filter + 1-row aggregate over the k-row sample.
    */
  def htTotalAudit(df: DataFrame, idCol: String, weight: Column, y: Column,
                   ks: Seq[Int], numParts: Int = 32): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "each k must be >= 1")
    val base = df.withColumn("__w", weight.cast("long"))
      .withColumn("__y", y.cast("long"))
    val (summed, total) = graft.relational.PrefixSum.runningSum(
      base, idCol, "__w", "cw", numParts)
    require(total > 0L, "htTotalAudit: total weight must be positive")
    // 1-row bounded read — the exact corpus total the estimates audit against
    val exactY = base.agg(sum(col("__y"))).head().getLong(0)
    require(exactY > 0L, "htTotalAudit: corpus total of y must be positive")
    ks.map { k =>
      summed
        .filter(expr(s"(cw * $k) div $total > ((cw - __w) * $k) div $total"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(expr(s"GREATEST(1000 * __y, (1000 * __y * " +
            s"CAST($total AS DECIMAL(38,0))) div ($k * __w))")).as("__ht"))
        .select(lit(k.toLong).as("k"), col("n_sampled"),
          lit(exactY).as("exact_total"),
          col("__ht").cast("long").as("ht_estimate_milli"),
          expr(s"CAST((1000 * (CAST(__ht AS DECIMAL(38,0)) - 1000 * $exactY))" +
            s" div (1000 * CAST($exactY AS DECIMAL(38,0))) AS BIGINT)")
            .as("err_permille"))
    }.reduce(_ unionByName _)
  }

  /** EXACT-balance stratified k-fold assignment: within each stratum, rows
    * are ordered by a deterministic md5 shuffle of the key and dealt
    * round-robin into k folds — per-(stratum, fold) counts differ by AT
    * MOST ONE, a guarantee proportional hash splits ([[splitTag]]) only
    * give in expectation. The cross-validation / sharded-eval shape where
    * every fold must see the same stratum mix.
    *
    * One window per stratum (hash-partitioned on the stratum columns —
    * strata are dims like (source, lang); a corpus whose single stratum is
    * huge should sub-salt the stratum or use the grouped prefix sum).
    * Adds `fold` (0..k−1).
    */
  def stratifiedKFold(df: DataFrame, stratumCols: Seq[String], keyCol: Column,
                      k: Int): DataFrame = {
    require(k >= 2, "need at least two folds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCols.map(col): _*)
      .orderBy(md5(keyCol.cast("string")))
    df.withColumn("fold", ((row_number().over(w) - 1) % k).cast("long"))
  }

}
