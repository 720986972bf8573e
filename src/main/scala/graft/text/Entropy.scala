package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document unigram-entropy quality signal in integer bits — the
  * compressibility axis of quality filtering: very LOW entropy flags
  * repetition/boilerplate (the Gopher-rule failure modes, O37, seen through
  * one number), very HIGH entropy flags token soup (hashes, minified junk).
  * The deterministic stand-in for "gzip ratio" filters used on web corpora.
  *
  * Signal: H_bits = Σ_t c_t · bits(n div c_t), where n = doc tokens, c_t =
  * occurrences of t, and bits(x) = ⌊log₂ x⌋ computed as length(bin(x)) − 1
  * on BIGINTs — the library's libm-free integer-surprisal discipline (same
  * as the NB classifier and bigram LM), hash-identical in any engine. The
  * permille rate bits_per_token fits a [0, log₂ n] scale callers threshold.
  *
  * Scale: one explode + (doc, token) count (map-side combined), one per-doc
  * aggregation riding the same key family — no joins, no windows, no model.
  */
object Entropy {

  /** (doc_id, n_tokens, n_distinct, entropy_bits, millibits_per_token).
    * The tf → totals → join → fold chain is keyed on doc_id throughout, so
    * after the first aggregation's exchange everything is co-partitioned.
    */
  def unigramEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("c"))
    val totals = tf.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"))
    tf.join(totals, Seq("doc_id"))
      .withColumn("__bits",
        (length(bin(expr("n_tokens div c"))) - 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(max(col("n_tokens")).as("n_tokens"),
        max(col("n_distinct")).as("n_distinct"),
        sum(col("c") * col("__bits")).as("entropy_bits"))
      .withColumn("millibits_per_token",
        expr("(1000L * entropy_bits) div n_tokens"))
  }
}
