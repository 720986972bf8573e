package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record-linkage scoring (Fellegi & Sunter 1969, JASA) over
  * blocked candidate pairs — the probabilistic "are these two records the
  * same entity?" weight, kept fully rational so the oracle can replay it:
  * a pair's match evidence is the likelihood RATIO
  *
  *     R = Π_f (m_f / u_f)^{agree_f} · ((1−m_f)/(1−u_f))^{1−agree_f}
  *
  * and instead of summing log-weights (floats) we carry the numerator and
  * denominator as exact integer products of permille factors: with F
  * comparison fields each factor ≤ 1000, so num,den ≤ 1000^F — within
  * int64 for F ≤ 6 (loudly required). The ranking value is the truncating
  * 1000·num div den.
  *
  * u-probabilities (chance agreement between NON-matches) are estimated
  * from the data itself, exactly: u_f = Σ_v (cnt_v/N)² in permille via
  * integer cross-multiplication (Σ cnt² · 1000) div N² — the standard
  * frequency-based estimate (random pairs agree when both draw the same
  * value). m (agreement between true matches) is a fixed documented
  * permille constant — without labeled matches the EM refinement has no
  * data, and a shared m keeps field weights comparable.
  *
  * Scale: the whole probe model — record count, every field's
  * value-frequency Σcnt² (the u numerator), and the hottest block size —
  * is ONE grouping-sets aggregation (map-side combined, per-set
  * value-cardinality-sized) collecting F+2 scalar rows, memoized per
  * canonicalized input plan; candidate pairs come from an equi-join on the
  * block key, never all-pairs, and the probed hottest block REFUSES past
  * `maxBlock` (quadratic blow-up must be a loud re-blocking decision, not
  * an OOM — the EditVerify discipline).
  */
object Linkage {

  /** Candidate pairs (id_a, id_b, per-field agree bits, score_num,
    * score_den, ratio_permille) for records blocked on `blockCols`,
    * compared on `fieldCols`. u floors/ceils at [1, 999]‰ so both
    * likelihood factors stay positive.
    */
  def scorePairs(records: DataFrame, idCol: String,
                 blockCols: Seq[String], fieldCols: Seq[String],
                 mPermille: Long = 950L, maxBlock: Int = 4096): DataFrame = {
    require(fieldCols.nonEmpty && fieldCols.size <= 6,
      s"1..6 comparison fields keep num/den within int64; got ${fieldCols.size}")
    // Duplicate grouping sets share ONE grouping_id: Expand would emit each
    // row once per duplicate set and the gid-keyed merge would double the
    // counts — u permille inflates ~4× and the hot-block guard reads 2×,
    // silently. Repeated names are refused loudly; a block set that
    // COINCIDES with a field set is legal (the sets are deduped below and
    // both logical consumers read the one shared gid).
    require(fieldCols.distinct == fieldCols,
      s"fieldCols must be distinct, got ${fieldCols.mkString(", ")}")
    require(blockCols.nonEmpty && blockCols.distinct == blockCols,
      s"blockCols must be nonempty and distinct, got ${blockCols.mkString(", ")}")
    require(mPermille >= 1 && mPermille <= 999,
      s"mPermille must be in [1,999], got $mPermille")

    // ONE fused probe job for the whole model — n, every field's Σcnt²
    // (the u numerator), and the hottest block size — via GROUPING SETS
    // ((f1), …, (fF), (blockCols…), ()): each set's per-group counts roll
    // up to (Σc², max c, Σc) keyed by grouping_id, and F+2 scalar rows come
    // back. This replaces the old 2+F sequential driver jobs (count, one
    // per-field u aggregation, the hot-block probe) — on a contended driver
    // each synchronous job launch costs a scheduling/GC pause (the r11
    // er_entity_clusters driver-bench outlier), so the probe model is also
    // MEMOIZED per canonicalized input plan (the Stages.materialize
    // discipline): a same-session re-run issues zero probe jobs. The loud
    // guards re-run from the memoized scalars on every call.
    val probeCols = (fieldCols ++ blockCols).distinct
    // grouping_id bit vector: first grouped column = most significant bit,
    // bit SET when the column is aggregated (not in the row's set)
    def gidOf(set: Set[String]): Long = probeCols.zipWithIndex.map {
      case (c, i) => if (set.contains(c)) 0L
        else 1L << (probeCols.length - 1 - i) }.sum
    val memoKey = (records.queryExecution.analyzed.canonicalized,
      fieldCols, blockCols)
    val byGid: Map[Long, (Long, Long, Long)] = {
      val hit = probeMemo.get(memoKey)
      if (hit != null) hit
      else {
        // DEDUPED sets: when blockCols == Seq(f) the block set and the
        // field set are ONE set with one gid — gidOf maps both consumers to
        // it, so the lookup stays correct without Expand ever duplicating
        val setKeys: Seq[Seq[String]] =
          (fieldCols.map(Seq(_)) :+ blockCols :+ Seq.empty[String])
            .map(_.sorted).distinct
        val sets: Seq[Seq[org.apache.spark.sql.Column]] =
          setKeys.map(_.map(col))
        val m = records.groupingSets(sets, probeCols.map(col): _*)
          .agg(grouping_id().as("__gid"), count(lit(1)).as("__c"))
          .groupBy(col("__gid")).agg(
            sum(col("__c") * col("__c")).as("__ss"),
            max(col("__c")).as("__mx"),
            sum(col("__c")).as("__tot"))
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
        probeMemo.put(memoKey, m)
        m
      }
    }
    val n = byGid(gidOf(Set.empty))._3
    require(n > 1, "linkage needs at least two records")

    // Exact frequency-based u per field, clamped to [1, 999] permille.
    val u: Map[String, Long] = fieldCols.map { f =>
      val sumSq = byGid(gidOf(Set(f)))._1
      f -> math.min(999L, math.max(1L, (1000L * sumSq) / (n * n)))
    }.toMap

    // Hot-block guard: the largest block bounds the per-block pair count.
    val hottest = byGid(gidOf(blockCols.toSet))._2
    require(hottest <= maxBlock,
      s"hottest block has $hottest records (> $maxBlock): re-block on finer " +
        "keys before pairing — refusing a quadratic blow-up")

    val a = records.as("a")
    val b = records.as("b")
    val blockEq = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    val pairs = a.join(b, blockEq && col(s"a.$idCol") < col(s"b.$idCol"))

    val agreeCols = fieldCols.map { f =>
      when(col(s"a.$f") <=> col(s"b.$f"), 1L).otherwise(0L).as(s"agree_$f")
    }
    val num = fieldCols.map { f =>
      when(col(s"agree_$f") === 1L, lit(mPermille))
        .otherwise(lit(1000L - mPermille))
    }.reduce(_ * _)
    val den = fieldCols.map { f =>
      when(col(s"agree_$f") === 1L, lit(u(f))).otherwise(lit(1000L - u(f)))
    }.reduce(_ * _)

    pairs
      .select(col(s"a.$idCol").as("id_a") +: col(s"b.$idCol").as("id_b") +:
        agreeCols: _*)
      .withColumn("score_num", num)
      .withColumn("score_den", den)
      .withColumn("ratio_permille", expr("(1000L * score_num) div score_den"))
  }

  /** (canonicalized records plan, fieldCols, blockCols) -> grouping_id →
    * (Σc², max c, Σc). Bounded: F+2 scalar triples per distinct linkage
    * input a session sees; same per-session-memo contract as
    * `Stages.materialize` (source files immutable mid-session).
    */
  private val probeMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      Seq[String], Seq[String]),
    Map[Long, (Long, Long, Long)]]()

  graft.MemoLedger.register("linkage.probe") { () =>
    import scala.jdk.CollectionConverters._
    (probeMemo.size.toLong,
      probeMemo.values.asScala.map(m => 16L + 56L * m.size).sum)
  }
}
