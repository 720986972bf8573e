package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-center greedy coreset selection (Gonzalez 1985 farthest-point
  * traversal; the "k-Center-Greedy" of Sener & Savarese 2018 active-learning
  * coresets) — pick k points such that every corpus vector is close to some
  * pick; the standard diversity-maximizing seed set for curation, eval-set
  * construction, and k-means++-style initialization at corpus scale.
  *
  * Scale design: k driver rounds, each ONE distributed argmax
  * (`TakeOrderedAndProject`, answer-sized — the same bounded-collect class
  * as the trained k-means in [[Clustering]]). Round r recomputes r
  * dist-folds over the scan rather than caching — lineage is k chained
  * `least` columns over one base scan, so the total work is O(k²·n/2)
  * row-local fold evaluations with NO shuffle anywhere (the argmax's
  * TakeOrdered ships one row per partition). At k≈tens and 100 TB the scan
  * dominates; for k≳100 pass `landEvery` (≈8–16) to periodically land the
  * running min-distance column and cap the fold chain — trajectory
  * bit-identical either way.
  *
  * Exactness: vectors are quantized to integer micro-units
  * (floor(x·10⁶) — |x|≤0.53, dim 64 ⇒ per-pair squared distance ≤ 7.2e13,
  * comfortably in long), so every distance is EXACT integer math and the
  * selection is bit-reproducible across engines — the DuckDB oracle replays
  * the identical greedy trajectory as chained CTEs. Ties break on the
  * smaller id (ORDER BY dist DESC, id ASC).
  */
object Coreset {

  /** The greedy trajectory: (round 1..k, vec_id, dist2) where dist2 is the
    * selection score — the squared quantized norm for the seed (farthest
    * from the origin, the deterministic stand-in for "first pick"), and the
    * squared distance to the nearest earlier pick for every later round.
    *
    * `landEvery` is the k≳100 path: every m rounds the running (id, q,
    * min-dist) frame is LANDED durably ([[graft.relational.Stages
    * .materialize]]) so the next rounds fold over the landed column instead
    * of re-evaluating the whole `least` chain from the base scan — lineage
    * cost drops from O(k²·n) fold evaluations to O(k·m·n) plus k/m compact
    * corpus writes. The landed frame holds EXACT integers, so the
    * trajectory is bit-identical to the fold form (asserted in
    * CoresetSpec). 0 (default) = never land, right at k≈tens where the
    * fold chain is cheaper than any write.
    */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String, k: Int,
                    quantScale: Double = 1000000.0,
                    landEvery: Int = 0): DataFrame = {
    require(k >= 1, "need at least one center")
    val spark = df.sparkSession
    val q = df.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(quantScale)).cast("long")).as("q"))

    def dist2To(center: Seq[Long]): Column =
      aggregate(
        zip_with(col("q"), typedLit(center), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)

    val norm2 = aggregate(transform(col("q"), x => x * x), lit(0L), (acc, x) => acc + x)

    var selected = Vector.empty[(Long, Long, Seq[Long])] // (id, score, vec)
    val seed = q.withColumn("__d", norm2)
      .orderBy(desc("__d"), asc("id")).limit(1)
      .select(col("id"), col("__d"), col("q"))
      .collect()(0)
    selected :+= ((seed.getLong(0), seed.getLong(1), seed.getSeq[Long](2)))

    var cur = q.withColumn("__md", dist2To(selected.head._3))
    var exhausted = false
    for (r <- 2 to k if !exhausted) {
      val rows = cur.filter(!col("id").isin(selected.map(_._1): _*))
        .orderBy(desc("__md"), asc("id")).limit(1)
        .select(col("id"), col("__md"), col("q"))
        .collect()
      if (rows.isEmpty) {
        // k exceeds the corpus: return the full trajectory so far
        exhausted = true
      } else {
        val row = rows(0)
        val pick = (row.getLong(0), row.getLong(1), row.getSeq[Long](2))
        selected :+= pick
        if (r < k) {
          cur = cur.withColumn("__md", least(col("__md"), dist2To(pick._3)))
          if (landEvery > 0 && (r - 1) % landEvery == 0)
            cur = graft.relational.Stages.materialize(cur, s"kcenter_land_r$r")
        }
      }
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, d, _), i) => (i + 1L, id, d) }
      .toDF("round", "vec_id", "dist2")
  }
}
