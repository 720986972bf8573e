package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition/quality heuristics (Rae et al. 2021, §A1.1
  * "Quality filtering") — the rule family production corpora apply BEFORE
  * any model-based filter: word-count bounds, mean-word-length bounds,
  * type-token ratio, most-frequent-bigram share, duplicate-trigram share.
  *
  * Reference scope: the reference engine routes and validates event
  * payloads (lib/kinesisHandler.js:112-139); corpus gates like this are the
  * training-data-pipeline extension mandated by SURVEY §2 O-rows.
  *
  * Scale design: every signal here is computed ROW-LOCALLY with
  * higher-order array functions over the split token array — zero shuffles,
  * zero windows, zero joins; the operator is a map-only projection that
  * pipelines into whatever shuffle the CALLER needs next. The alternative
  * (explode + per-doc window + three grouped aggregations, the shape the
  * DuckDB oracle uses) costs a window shuffle plus three hash shuffles at
  * 100 TB for signals that never need cross-row state. Higher-order
  * functions are not whole-stage-codegen'd, but they stay inside one
  * narrow-stage task per row with no exchange — the scan stays the
  * bottleneck, which is the floor.
  *
  * All ratios are permille/centi INTEGER divisions (`div`), so every value
  * is exact and engine-portable (no IEEE rounding in any compared column).
  */
object GopherRules {

  /** Max run length in a SORTED string array — the count of the most
    * frequent element — as a single row-local fold.
    */
  private def maxRun(sortedArr: Column): Column = {
    val fold = aggregate(
      sortedArr,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev").isNotNull && x === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    fold
  }

  /** Adjacent n-grams of a token array as strings, row-local.
    * n=2 → "a b", n=3 → "a b c"; empty array when the doc is shorter than n.
    */
  private def grams(arr: Column, n: Int): Column =
    when(size(arr) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(arr) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(arr, i + j + 1)): _*)))

  /** Per-doc repetition signals: input columns + n_words, n_word_chars,
    * mean_word_len_centi, ttr_permille, top_bigram_permille,
    * dup_trigram_permille, and a `keep` verdict from the supplied bounds.
    * All integer-exact; `keep` is the Gopher-style conjunctive gate.
    */
  def repetitionSignals(docs: DataFrame, textCol: String,
                        minWords: Long = 20, maxWords: Long = 100000,
                        minMeanLenCenti: Long = 200, maxMeanLenCenti: Long = 1200,
                        minTtrPermille: Long = 200,
                        maxTopBigramPermille: Long = 180,
                        maxDupTrigramPermille: Long = 600): DataFrame = {
    val withArr = docs.withColumn("__a", split(col(textCol), " "))
    val sig = withArr
      .withColumn("n_words", size(col("__a")).cast("long"))
      .withColumn("n_word_chars",
        aggregate(col("__a"), lit(0L), (acc, x) => acc + length(x).cast("long")))
      .withColumn("__ndw", size(array_distinct(col("__a"))).cast("long"))
      .withColumn("__bg", array_sort(grams(col("__a"), 2)))
      .withColumn("__tg", grams(col("__a"), 3))
      .withColumn("__nbg", size(col("__bg")).cast("long"))
      .withColumn("__topbg", when(size(col("__bg")) === 0, lit(0L))
        .otherwise(maxRun(col("__bg"))))
      .withColumn("__ntg", size(col("__tg")).cast("long"))
      .withColumn("__ndtg", size(array_distinct(col("__tg"))).cast("long"))
      .withColumn("mean_word_len_centi",
        expr("(100L * n_word_chars) div n_words"))
      .withColumn("ttr_permille", expr("(1000L * __ndw) div n_words"))
      .withColumn("top_bigram_permille",
        when(col("__nbg") === 0, lit(0L))
          .otherwise(expr("(1000L * __topbg) div __nbg")))
      .withColumn("dup_trigram_permille",
        when(col("__ntg") === 0, lit(0L))
          .otherwise(expr("(1000L * (__ntg - __ndtg)) div __ntg")))
    sig
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len_centi").between(minMeanLenCenti, maxMeanLenCenti) &&
          col("ttr_permille") >= minTtrPermille &&
          col("top_bigram_permille") <= maxTopBigramPermille &&
          col("dup_trigram_permille") <= maxDupTrigramPermille)
      .drop("__a", "__ndw", "__bg", "__tg", "__nbg", "__topbg", "__ntg", "__ndtg")
  }
}
