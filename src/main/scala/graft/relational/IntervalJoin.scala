package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-interval joins without nested loops.
  *
  * "For each left event, the right events of the same key within the
  * trailing window [t−w, t)" is a non-equi join; Spark's default plan for it
  * is a broadcast-nested-loop or a full sort-merge over the key alone — both
  * quadratic in the hot-key row count. Bucketizing event time to width-w
  * buckets turns it into an EQUI join: a right row in bucket b can only
  * match left rows in buckets {b, b+1}, so duplicating the LEFT side into
  * its two candidate buckets and equi-joining on (key, bucket) bounds the
  * join fan-in to two buckets per row, then one residual range filter keeps
  * the exact window. Shuffle keys are (key, bucket) — time-locality gives
  * near-uniform buckets even when a key is hot across a long history.
  */
object IntervalJoin {

  /** Count right rows with the same `keyCol` whose `rTimeCol` falls in
    * [lTime − windowMicros, lTime) for every left row. Left rows with no
    * matches get 0 (left join back on `leftIdCol`).
    *
    * @param leftIdCol must uniquely identify left rows — counts for rows
    *                  sharing an id would merge into one group
    * @return left columns + (outName: long)
    */
  def recentCount(left: DataFrame, leftIdCol: String, keyCol: String,
                  lTimeCol: String, right: DataFrame, rTimeCol: String,
                  windowMicros: Long, outName: String): DataFrame = {
    require(windowMicros > 0)
    val lb = left
      .withColumn("__lt", unix_micros(col(lTimeCol)))
      .withColumn("__b0", expr(s"__lt div $windowMicros"))
      .withColumn("__b", explode(array(col("__b0") - 1, col("__b0"))))
      .select(col(leftIdCol).as("__lid"), col(keyCol).as("__lk"),
        col("__lt"), col("__b"))
    val rb = right
      .withColumn("__rt", unix_micros(col(rTimeCol)))
      .withColumn("__b", expr(s"__rt div $windowMicros"))
      .select(col(keyCol).as("__rk"), col("__rt"), col("__b"))
    val matched = lb
      .join(rb, lb("__lk") === rb("__rk") && lb("__b") === rb("__b"))
      .filter(col("__rt") >= col("__lt") - windowMicros &&
        col("__rt") < col("__lt"))
      .groupBy(col("__lid"))
      .agg(count(lit(1)).as(outName))
    left
      .join(matched, left(leftIdCol) === matched("__lid"), "left")
      .drop("__lid")
      .withColumn(outName, coalesce(col(outName), lit(0L)))
  }

  /** For each left row, the EARLIEST right row of the same key in
    * [t − w, t) — first-touch attribution. Same two-bucket equi-join shape
    * as [[recentCount]]; the per-left argmin is a `min(struct(rt, rid))`
    * aggregate (lexicographic, rid as the deterministic tiebreak), so no
    * per-group sort and no window over the matched set. Left rows with no
    * match carry nulls.
    *
    * @return left columns + (outTs: timestamp, outId: long)
    */
  def firstInWindow(left: DataFrame, leftIdCol: String, keyCol: String,
                    lTimeCol: String, right: DataFrame, rIdCol: String,
                    rTimeCol: String, windowMicros: Long,
                    outTs: String, outId: String): DataFrame = {
    require(windowMicros > 0)
    val lb = left
      .withColumn("__lt", unix_micros(col(lTimeCol)))
      .withColumn("__b0", expr(s"__lt div $windowMicros"))
      .withColumn("__b", explode(array(col("__b0") - 1, col("__b0"))))
      .select(col(leftIdCol).as("__lid"), col(keyCol).as("__lk"),
        col("__lt"), col("__b"))
    val rb = right
      .withColumn("__rt", unix_micros(col(rTimeCol)))
      .withColumn("__b", expr(s"__rt div $windowMicros"))
      .select(col(keyCol).as("__rk"), col(rIdCol).as("__rid"),
        col("__rt"), col("__b"))
    val matched = lb
      .join(rb, lb("__lk") === rb("__rk") && lb("__b") === rb("__b"))
      .filter(col("__rt") >= col("__lt") - windowMicros &&
        col("__rt") < col("__lt"))
      .groupBy(col("__lid"))
      .agg(min(struct(col("__rt"), col("__rid"))).as("__m"))
    left
      .join(matched, left(leftIdCol) === matched("__lid"), "left")
      .withColumn(outTs, timestamp_micros(col("__m.__rt")))
      .withColumn(outId, col("__m.__rid"))
      .drop("__lid", "__m")
  }
}
