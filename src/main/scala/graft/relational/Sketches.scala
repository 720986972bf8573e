package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Constant-size probabilistic summaries: Count-Min frequency sketch and a
  * Bloom-filter runtime join filter.
  *
  * Count-Min hashes with md5 (the one hash every engine computes
  * identically), so the sketch contents — not just their consumers — are
  * oracle-checkable, unlike xxhash/murmur-based sketches. The bloom filter
  * hashes with xxhash64 — its contents never reach a result, so it takes
  * the codegen'd hash instead (see [[bloomPositions]]).
  *
  * Scale shapes:
  *  - Count-Min: the sketch is depth×width counters regardless of input
  *    size. Build is one map-side-combined aggregation (each partition holds
  *    at most depth·width partial states — constant memory), and sketches
  *    from different partitions/days/streams MERGE by cell-wise addition,
  *    which is exactly what the shuffle's final combine does. Estimates are
  *    an equi-join of key coordinates against the tiny sketch (broadcast).
  *  - Bloom: the filter is mBits/64 longs — kilobytes for millions of build
  *    keys — collected once on the driver (same pattern as an IVF centroid
  *    table) and applied as a LITERAL predicate on the probe side, so the
  *    big table is pruned BEFORE its shuffle/join: the runtime-filter
  *    pattern that cuts shuffle volume by the build side's selectivity.
  *    False positives only cost work; the exact join afterwards keeps
  *    results identical to the unfiltered plan.
  */
object Sketches {

  /** Row j of the hash family: 32 uniform md5 bits of "j:key", mod width. */
  private def cmBucket(key: Column, j: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$j:"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build a Count-Min sketch: one row per (j, bucket) cell with its count.
    * depth×width rows total — the constant-size summary of any input size.
    */
  def countMinSketch(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    df.select(explode(array((0 until depth).map(j =>
        struct(lit(j.toLong).as("j"), cmBucket(col(keyCol), j, width).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate frequencies for `keys` from a sketch: est(key) =
    * min over j of cell(j, h_j(key)) — ≥ true count always (CM guarantee).
    * A cell the build never touched counts as 0 (left join + coalesce), so
    * a key absent from the build data estimates 0 instead of vanishing or
    * overshooting on its remaining non-empty cells.
    */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                       depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol),
        explode(array((0 until depth).map(j =>
          struct(lit(j.toLong).as("j"), cmBucket(col(keyCol), j, width).as("bucket"))): _*)).as("c"))
      .select(col(keyCol), col("c.j").as("j"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** k bit positions in [0, mBits) for a key — seeded xxhash64, not md5:
    * unlike the Count-Min sketch, the bloom filter's CONTENTS never reach a
    * result (false positives only admit rows the exact join then drops), so
    * cross-engine hash portability buys nothing and the probe side would
    * otherwise pay k string-concat+md5+hex-parse per row of the BIG table.
    * xxhash64 stays inside whole-stage codegen.
    */
  private def bloomPositions(key: Column, k: Int, mBits: Int): Seq[Column] =
    (0 until k).map(j => pmod(xxhash64(lit(j), key), lit(mBits.toLong)))

  /** Aggregate the build side's keys into a packed bit array (mBits/64
    * longs), collected to the driver — kilobytes, like a broadcast dim.
    */
  def bloomBuild(df: DataFrame, keyCol: String, k: Int, mBits: Int): IndexedSeq[Long] = {
    require(mBits % 64 == 0, "mBits must pack into whole longs")
    val words = df
      .select(explode(array(bloomPositions(col(keyCol), k, mBits): _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("bit"))
      .groupBy(col("w")).agg(bit_or(col("bit")).as("word"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until mBits / 64).map(w => words.getOrElse(w, 0L))
  }

  /** Membership predicate against a built filter — a literal expression, so
    * it pushes into the probe side's scan with no join and no shuffle.
    */
  def bloomMightContain(words: IndexedSeq[Long], key: Column, k: Int): Column = {
    val mBits = words.size * 64
    // one ArrayType literal, not an `array(...)` of thousands of children —
    // keeps the expression tree (and generated code) constant-size in mBits
    val arr = typedLit(words)
    bloomPositions(key, k, mBits).map { pos =>
      (call_function("shiftrightunsigned",
        element_at(arr, (pos / 64).cast("int") + 1),
        (pos % 64).cast("int")).bitwiseAND(lit(1L))) === lit(1L)
    }.reduce(_ && _)
  }
}
