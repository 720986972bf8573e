package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse table-maintenance operators: MERGE-style upsert, SCD2
  * effective-dated history, and a small-file compaction planner.
  *
  * These are the operations that keep a 100 TB table healthy between
  * queries: applying a change feed (CDC upsert with delete markers),
  * materializing slowly-changing-dimension history, and planning the
  * bin-packing of small files into target-sized outputs. Each is expressed
  * as a declarative Spark plan — one shuffle for the merge (or zero when
  * the change feed broadcasts), per-key windows for history (never
  * global), and a per-table-partition window for compaction (file COUNTS
  * are metadata-sized even when the data is 100 TB).
  */
object TableMaintenance {

  /** Latest-wins CDC upsert: apply `changes` over `base` keyed by `keyCol`.
    *
    * `changes` carries an `opCol` ('U' upsert / 'D' delete) and a
    * `versionCol` that must totally order each key's feed rows; when a key
    * appears multiple times, the highest version wins — resolved with one
    * max_by aggregation (map-side combined, no per-key window). The merge
    * itself is a full-outer join on the key: unmatched base rows survive,
    * unmatched 'U' changes insert, matched rows take the change's payload
    * column-wise, and 'D' rows delete. Full outer cannot broadcast, so the
    * plan co-partitions both sides on the key — one shuffle of the
    * snapshot, which disappears entirely when the base table is stored
    * bucketed on the key (the layout a merge-heavy table should have); the
    * feed side is answer-sized. When a feed distinguishes inserts from
    * updates ('I' vs 'U'), the zero-shuffle variant is a broadcast LEFT
    * join for update/delete plus a UNION ALL of the feed's inserts.
    *
    * @param payloadCols change columns that overwrite base columns of the
    *                    SAME name (base keeps its value when the feed has
    *                    no row for the key)
    */
  def upsert(base: DataFrame, changes: DataFrame, keyCol: String,
             versionCol: String, opCol: String,
             payloadCols: Seq[String]): DataFrame = {
    val latest = changes
      .groupBy(col(keyCol).as("__ck"))
      .agg(
        max_by(struct((opCol +: payloadCols).map(col): _*),
          col(versionCol)).as("__c"))
      .select(col("__ck"), col(s"__c.$opCol").as("__op"),
        struct(payloadCols.map(c => col(s"__c.$c").as(c)): _*).as("__p"))
    val merged = base
      .join(latest, base(keyCol) === latest("__ck"), "full_outer")
      .filter(coalesce(col("__op"), lit("U")) =!= "D")
    val outKey = coalesce(base(keyCol), col("__ck")).as(keyCol)
    val keep = base.columns.filterNot(c => c == keyCol || payloadCols.contains(c))
      .map(base(_))
    val over = payloadCols.map(c => coalesce(col(s"__p.$c"), base(c)).as(c))
    merged.select(outKey +: (keep ++ over): _*)
  }

  /** SCD2 history: one effective-dated row per state change of a key.
    *
    * Each input row is a state observation (key, changeTime, attrs); the
    * output adds `eff_to` = the key's next change time (null while
    * current) and `is_current`. The window partitions by key — state
    * cardinality per key is bounded, so no single-partition sort exists at
    * any scale. `tiebreakCol` makes same-instant changes deterministic.
    */
  def scd2(states: DataFrame, keyCol: String, timeCol: String,
           tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tiebreakCol))
    states
      .withColumn("eff_to", lead(col(timeCol), 1).over(w))
      .withColumn("is_current",
        when(col("eff_to").isNull, 1L).otherwise(0L))
  }

  /** Compaction planner: assign files to target-size output bins.
    *
    * For each table partition (`groupCol`), files are taken in `orderCol`
    * order and a file lands in bin floor(bytes-before-it / targetBytes) —
    * the streaming first-fit plan every OPTIMIZE implementation uses. The
    * input is file METADATA (one row per file), so even a 100 TB table is
    * ~10⁵ rows; the per-partition cumulative-sum window is both correct
    * and cheap, and no bin exceeds targetBytes + the largest single file.
    */
  def compactionBins(files: DataFrame, groupCol: String, orderCol: String,
                     sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("bytes_before",
        coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"bytes_before div ${targetBytes}L"))
  }

  /** Snapshot reconciliation diff: per-row verdict between two versions of
    * a keyed table — the audit every migration/backfill/CDC pipeline runs
    * to PROVE what changed ("the merge touched exactly these keys, changed
    * exactly these columns") instead of trusting it.
    *
    * One co-partitioned full-outer join on the key (the same single-shuffle
    * shape as [[upsert]]; bucketed storage removes it), then row-local
    * null-safe column compares. Verdicts: 'added' (key only in `next`),
    * 'removed' (key only in `base`), 'changed' (key in both, ≥1 compared
    * column differs under null-safe equality), 'unchanged'. Per-column
    * `chg_<col>` flags (0/1) let the caller aggregate column-level change
    * counts without a second pass.
    *
    * @return one row per key in either version:
    *         (key, change, chg_<c1>, chg_<c2>, ...)
    */
  def snapshotDiff(base: DataFrame, next: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compared column")
    val b = base.select(col(keyCol).as("__k") +:
      compareCols.map(c => col(c).as(s"__b_$c")): _*)
    val n = next.select(col(keyCol).as("__nk") +:
      compareCols.map(c => col(c).as(s"__n_$c")): _*)
    val joined = b.join(n, col("__k") === col("__nk"), "full_outer")
    val flags = compareCols.map(c =>
      when(col("__k").isNull || col("__nk").isNull, lit(0L))
        .otherwise(when(col(s"__b_$c") <=> col(s"__n_$c"), 0L).otherwise(1L))
        .as(s"chg_$c"))
    val anyChanged = compareCols
      .map(c => !(col(s"__b_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change",
        when(col("__k").isNull, lit("added"))
          .when(col("__nk").isNull, lit("removed"))
          .when(anyChanged, lit("changed"))
          .otherwise(lit("unchanged")))
      .select(coalesce(col("__k"), col("__nk")).as(keyCol) +:
        col("change") +: flags: _*)
  }
}
