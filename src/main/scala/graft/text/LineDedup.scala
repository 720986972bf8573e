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
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .withColumn("seg", expr(s"pos div $segWords"))
      .groupBy(col(idCol), col("seg"))
      .agg(
        // Rebuild the segment deterministically regardless of collect order:
        // sort the (pos, word) structs, then project words. The lambda runs
        // over at most segWords elements per row — bounded, not a hot path.
        array_join(
          transform(array_sort(collect_list(struct(col("pos").as("p"), col("word").as("w")))),
            x => x.getField("w")),
          " ").as("seg_text"),
        count(lit(1)).as("n_words"))
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
    val segs = segments(docs, idCol, textCol, segWords)
      .withColumn("fp", md5(col("seg_text")))
    val freq = segmentDocFrequency(segs, idCol)
    segs.join(freq, "fp")
      .filter(col("df") <= maxDocs)
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("seg").as("s"), col("seg_text").as("t")))),
            x => x.getField("t")),
          " ").as(textCol))
  }
}
