package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring detection — the ExactSubstr variant of Lee et
  * al. 2022 ("Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499). The paper builds one corpus-wide suffix array and
  * removes every span of ≥ k tokens that occurs twice anywhere in the
  * corpus; a suffix array is inherently single-machine, so the distributed
  * shape here derives the identical spans from k-gram anchors instead:
  *
  *   1. anchor: every full k-token window of every doc as (doc_id, pos, fp)
  *      where fp is a 16-hex md5 fingerprint of the window text — one row
  *      per token position, corpus-scale but 3 compact columns.
  *   2. duplicated anchor: a count over `Window.partitionBy(fp)` marks the
  *      positions whose k-gram occurs ≥ 2 times corpus-wide (any doc, any
  *      position — same-doc repeats included, exactly the paper's rule).
  *      The window costs ONE shuffle by fp and replaces the
  *      groupBy-then-join-back shape, which would shuffle the same frame by
  *      fp twice.
  *   3. span assembly: a span of duplicated text is a maximal run of
  *      duplicated anchors. Two anchors p < q overlap as token ranges iff
  *      q − p < k, so islands split exactly at gaps ≥ k (lag + running
  *      sum over the per-doc window). Island [p0, p1] covers tokens
  *      [p0, p1 + k − 1], and islands are ≥ k apart by construction —
  *      coverage sums are exact union sizes with no interval merging.
  *
  * Every k-gram that occurs twice lies inside some duplicated run of
  * length ≥ k, and every duplicated run of length L ≥ k contains exactly
  * L − k + 1 duplicated anchors forming one island — so the spans equal
  * the suffix-array answer for word-aligned duplicates.
  *
  * Scale: two corpus-wide shuffles of the 3-column anchor frame (by fp,
  * then by doc) — the same budget as the portable-minhash signature
  * pipeline. A degenerate boilerplate gram (one fp with millions of
  * occurrences) concentrates its positions into one window partition; the
  * paper's own mitigation — run line/boilerplate dedup first — applies
  * unchanged, and [[graft.text.LineDedup]] is that stage in this engine.
  */
object ExactSubstr {

  /** (doc_id, pos, fp) for every full k-token window of every doc.
    * Windows are assembled with per-doc `lead`s over exploded tokens (the
    * measured-fastest shingle shape — see [[MinHash]]); md5 keeps the
    * fingerprint portable to the DuckDB oracle, and 16 hex chars (64 bits)
    * make cross-gram collisions ~vocab²/2⁶⁴ — the repo-wide accepted
    * fingerprint risk.
    */
  def anchors(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, "anchor width must be at least 2 tokens")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until k).map(i => lead(col("t"), i).over(w))
    docs
      .select(col(idCol).as("doc_id"), posexplode(split(col(textCol), " ")).as(Seq("pos", "t")))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("t") +: leads: _*).as("gram"),
        leads.last.isNotNull.as("full"))
      .filter(col("full"))
      .select(col("doc_id"), col("pos"), substring(md5(col("gram")), 1, 16).as("fp"))
  }

  /** Maximal duplicated spans: (doc_id, span_start, span_end, n_anchors),
    * token positions inclusive, one row per span. Docs with no duplicated
    * window produce no rows.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val dup = anchors(docs, idCol, textCol, k)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("n") >= 2)
      .select(col("doc_id"), col("pos"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // first anchor of a doc has no lag → the coalesced sentinel forces brk=1
    dup
      .withColumn("brk",
        when(col("pos") - coalesce(lag(col("pos"), 1).over(wd), lit(-1000000)) >= k, 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(wd))
      // doc_id ⊂ (doc_id, isl): the aggregation rides the island window's
      // hash partitioning — no extra shuffle
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + (k - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_anchors"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_anchors"))
  }

  /** Per-doc duplicated-text coverage over [[duplicatedSpans]]: every doc,
    * zero-filled — (doc_id, total_tokens, n_spans, n_anchors,
    * covered_tokens, dup_permille). The paper's removal policy (drop the
    * duplicated spans, keep the remainder) keys off exactly these spans;
    * the permille column is the doc-level filter signal.
    */
  def docCoverage(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val per = duplicatedSpans(docs, idCol, textCol, k)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("n_anchors")).as("n_anchors"),
        sum(col("span_end") - col("span_start") + 1).as("covered_tokens"))
    docs
      .select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("total_tokens"))
      .join(per, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "n_anchors", "covered_tokens"))
      .withColumn("dup_permille", expr("covered_tokens * 1000 div total_tokens"))
  }
}
