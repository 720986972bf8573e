package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Span-corruption planning (the T5/UL2 denoising objective's preprocessing,
  * Raffel 2020 §3.1.4): deterministically pick mask-span starts over each
  * document's token positions, merge overlapping spans, and report the
  * corruption statistics a data pipeline needs before materializing
  * (input, target) pairs — n_spans, masked token count, corruption rate.
  *
  * Determinism: a position starts a span iff its 60-bit md5-prefix of
  * "doc:pos" ≡ 0 (mod `rate`) — the library's portable-hash discipline, so
  * the mask plan is reproducible in any engine and the DuckDB oracle
  * hash-checks it. Overlapping fixed-length spans are merged by the island
  * trick (same as [[graft.dedup.ExactSubstr]]): consecutive starts ≤
  * spanLen−1 apart fuse, and a fused island [first..last] covers
  * min(last + spanLen, n) − first tokens.
  *
  * Scale: one explode, one per-doc window over START rows only (the
  * explode output is filtered to ~n/rate rows before the window), one
  * per-(doc, island) aggregation, one join back to per-doc counts — all
  * keyed on doc id.
  */
object SpanCorruption {

  /** (doc_id, n_tokens, n_starts, n_spans, masked_tokens,
    * corruption_permille).
    */
  def plan(docs: DataFrame, idCol: String, textCol: String,
           spanLen: Int = 3, rate: Int = 10): DataFrame = {
    require(spanLen >= 1 && rate >= 1)
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "t")))
    val totals = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
    val starts = toks.filter(
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        col("pos").cast("string"))), 1, 15), 16, 10).cast("long") % rate === 0)
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val islands = starts
      .withColumn("__brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= (spanLen - 1).toLong, 0L)
          .otherwise(1L))
      .withColumn("__isl", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perIsland = islands.groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).as("__p0"), max(col("pos")).as("__p1"),
        count(lit(1)).as("__ns"))
    val perDoc = perIsland
      .join(totals, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__ns")).as("n_starts"),
        count(lit(1)).as("n_spans"),
        sum(least(col("__p1") + spanLen.toLong, col("n_tokens"))
          - col("__p0")).as("masked_tokens"))
    totals.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_starts"), lit(0L)).as("n_starts"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("masked_tokens"), lit(0L)).as("masked_tokens"))
      .withColumn("corruption_permille",
        expr("(1000L * masked_tokens) div n_tokens"))
  }
}
