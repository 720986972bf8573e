package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style segment-level corpus deduplication.
  *
  * Web-scale training corpora dedupe not only whole documents but the
  * repeated BOILERPLATE inside them: any "line" (here: fixed-width word
  * segment, since the synthetic corpus has no newlines) that occurs in more
  * than `maxDocs` distinct documents is navigation/footer-grade text and is
  * dropped from every document that contains it (the C4 dataset's
  * three-sentence rule, applied segment-wise).
  *
  * Scale shape: one explode to (doc, segment) rows, one aggregation keyed by
  * the segment's 128-bit md5 fingerprint (shuffling a 16-byte key, never the
  * segment text), one broadcast-friendly equi-join back. No pairwise work —
  * cost is linear in corpus size, the same plan at 500 docs or 10⁹. The
  * fingerprint doubles as the cross-engine oracle key (md5 is md5
  * everywhere).
  */
object LineDedup {

  /** Explode each document into fixed-width word segments.
    * Output: (idCol, seg, seg_text, n_words); `seg` is the 0-based segment
    * ordinal, the final segment may be short.
    */
  def segments(docs: DataFrame, idCol: String, textCol: String,
               segWords: Int): DataFrame = {
    require(segWords > 0)
    docs
      .select(col(idCol), split(col(textCol), " ").as("__ws"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0L),
          expr(s"(size(__ws) + ${segWords - 1}) div $segWords") - 1,
          lit(1L)),
        i => {
          val sl = slice(col("__ws"), (i * segWords + 1).cast("int"), lit(segWords))
          struct(array_join(sl, " ").as("t"), size(sl).cast("long").as("n"))
        })).as(Seq("seg", "__s")))
      .select(col(idCol), col("seg").cast("long").as("seg"),
        col("__s.t").as("seg_text"), col("__s.n").as("n_words"))
  }

  /** Distinct-document frequency per segment fingerprint: (fp, df). */
  def segmentDocFrequency(segs: DataFrame, idCol: String): DataFrame =
    segs
      .select(md5(col("seg_text")).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(countDistinct(col(idCol)).as("df"))

  /** Per-document keep/drop accounting under the `df <= maxDocs` rule.
    * Output: (idCol, n_seg, kept_seg, dropped_seg, kept_words).
    */
  def dedupStats(docs: DataFrame, idCol: String, textCol: String,
                 segWords: Int, maxDocs: Int): DataFrame = {
    val segs = segments(docs, idCol, textCol, segWords)
      .withColumn("fp", md5(col("seg_text")))
    val freq = segmentDocFrequency(segs, idCol)
    val kept = col("df") <= maxDocs
    segs.join(freq, "fp")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_seg"),
        sum(when(kept, 1L).otherwise(0L)).as("kept_seg"),
        sum(when(!kept, 1L).otherwise(0L)).as("dropped_seg"),
        sum(when(kept, col("n_words")).otherwise(0L)).as("kept_words"))
  }

  /** The cleaning operator itself: documents with over-frequent segments
    * removed and the surviving segments rejoined in order. A document whose
    * EVERY segment is boilerplate drops out of the result entirely (no rows
    * survive the filter); left-join against the input id set if empty-text
    * rows are needed instead.
    */
  def cleanDocs(docs: DataFrame, idCol: String, textCol: String,
                segWords: Int, maxDocs: Int): DataFrame = {
    require(segWords > 0)
    // Per-doc segment array built row-locally; only FINGERPRINTS ever
    // shuffle. The doc-frequency pass shuffles (fp, id); the per-doc
    // drop-set gathers only BOILERPLATE hits (answer-sized — boilerplate is
    // by definition the repeated minority); the rebuild is an order-
    // preserving array filter, not a collect_list re-sort of all text.
    val segd = docs
      .select(col(idCol), split(col(textCol), " ").as("__ws"))
      .select(col(idCol), transform(
        sequence(lit(0L),
          expr(s"(size(__ws) + ${segWords - 1}) div $segWords") - 1,
          lit(1L)),
        i => array_join(
          slice(col("__ws"), (i * segWords + 1).cast("int"), lit(segWords)),
          " ")).as("__segs"))
    val fps = segd
      .select(col(idCol), explode(col("__segs")).as("__t"))
      .select(col(idCol), md5(col("__t")).as("fp"))
    // Two consumers (doc-frequency, bad-set join) recompute this narrow
    // projection — two scans of (id, 16-byte fp), NOT a cache: a lazy
    // operator has no action to scope an unpersist to, and an unbounded
    // corpus-sized cache entry in a long-lived session costs more (storage
    // pressure + disk-spilled blocks LRU never reclaims) than one extra
    // columnar scan. Callers that materialize repeatedly can cache the
    // RESULT under their own lifecycle.
    val bad = fps.groupBy(col("fp"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") > maxDocs)
    val badPerDoc = fps.join(bad.select("fp"), "fp")
      .groupBy(col(idCol)).agg(collect_set(col("fp")).as("__bad"))
    segd.join(badPerDoc, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__bad").isNull, col("__segs"))
          .otherwise(filter(col("__segs"),
            s => !array_contains(col("__bad"), md5(s)))).as("__kept"))
      .filter(size(col("__kept")) > 0)
      .select(col(idCol), array_join(col("__kept"), " ").as(textCol))
  }
}
