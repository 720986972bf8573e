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
}
