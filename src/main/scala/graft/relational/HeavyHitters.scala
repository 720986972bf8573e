package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-item ("heavy hitter") mining via sketch-then-verify.
  *
  * The naive plan — groupBy(item).count over every occurrence — shuffles the
  * full item stream; at 100 TB that is the job. Misra–Gries summaries make
  * the shuffle proportional to the ANSWER instead: each partition keeps at
  * most k bounded counters (one `mapPartitions` pass, no state beyond k
  * entries), and only the surviving CANDIDATE items are exactly counted and
  * thresholded.
  *
  * Correctness is the classic MG guarantee made distributed: with k counters
  * a partition's summary retains every item whose local frequency exceeds
  * n_p/(k+1) (each decrement step removes k+1 occurrences, so at most
  * n_p/(k+1) decrements ever happen). Summing across partitions,
  * Σ n_p/(k+1) = n/(k+1) < n/k — so by pigeonhole any item with GLOBAL
  * frequency > n/k beats its budget in at least one partition and survives
  * there. The exact verify pass then counts only candidate occurrences
  * (semi-join prunes the rest before the shuffle) and applies the global
  * `count·k > n` test, which discards MG's false positives. The output is
  * therefore EXACTLY the frequency-> n/k item set — deterministic, identical
  * to the naive plan, independent of partitioning.
  */
object HeavyHitters {

  /** Misra–Gries candidate items: per-partition k-counter summaries, merged
    * by distinct. Superset of every item with global frequency > n/(k+1).
    */
  def candidates(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k > 0)
    val s = items.sparkSession
    import s.implicits._
    items.select(col(itemCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { x =>
          counts.get(x) match {
            case Some(c) => counts.update(x, c + 1)
            case None if counts.size < k => counts.update(x, 1L)
            case None =>
              // decrement-all: one occurrence of each tracked item plus the
              // arriving item are discarded together (k+1 occurrences)
              counts.keys.toArray.foreach { key =>
                val c = counts(key) - 1
                if (c == 0L) counts.remove(key) else counts.update(key, c)
              }
          }
        }
        counts.keysIterator
      }
      .toDF(itemCol)
      .distinct()
  }

  /** Exact heavy hitters: items whose global frequency f satisfies f·k > n.
    * Output: (itemCol, cnt, n_total) — identical to the full groupBy plan.
    *
    * Two passes over the item stream total: the MG candidate pass, then ONE
    * verify pass that counts candidates and the corpus total together — each
    * non-candidate collapses into a single null group before the shuffle
    * (map-side combine), so the exchange stays answer-sized and no separate
    * count job rescans the stream. The total is folded back over the grouped
    * frame with an empty-partition window, which is safe precisely because
    * that frame is at most |candidates|+1 rows.
    */
  def exactHeavyHitters(items: DataFrame, itemCol: String, k: Int,
                        broadcastCandidateLimit: Long = 2000000L): DataFrame = {
    val cand = candidates(items, itemCol, k)
    // The candidate side is bounded by k per input partition — an upper
    // bound known from the PLAN, no extra counting job. Small bound →
    // broadcast (no shuffle of the item stream at all); large bound (10k
    // partitions × k=200 would broadcast 2M rows to every executor) →
    // shuffle hash join, which costs one item-stream shuffle but keeps
    // per-executor memory at the per-partition candidate slice.
    val candBound = k.toLong * items.rdd.getNumPartitions
    val tagged = cand.withColumn("__hit", lit(true))
    val probeSide =
      if (candBound <= broadcastCandidateLimit) broadcast(tagged)
      else tagged.hint("shuffle_hash")
    val grouped = items
      .join(probeSide, Seq(itemCol), "left")
      .groupBy(when(col("__hit"), col(itemCol)).as(itemCol))
      .agg(count(lit(1)).as("cnt"))
    grouped
      .withColumn("n_total",
        sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .filter(col(itemCol).isNotNull && col("cnt") * k > col("n_total"))
  }
}
