package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection: score every document in a raw pool by how
  * much its hashed n-gram profile looks like a TARGET domain (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169). The published method fits bag-of-hashed-ngrams
  * likelihoods for target and raw and keeps documents by the importance
  * ratio p_target(x)/p_raw(x); the feature side here is the same
  * (word bigrams hashed into a fixed bucket space), the weight side is a
  * log-free integer surrogate — the Laplace-smoothed per-bucket ratio
  * quantized to `scale` — so scores are integer-exact and bitwise
  * reproducible across engines (the repo-wide determinism rule; same trick
  * as the log-free idf in tfidf_top_terms). Swap the quantized column for
  * `log` of the same ratio to get the paper's additive log-likelihood form.
  *
  * Scale shape: bigrams are built row-locally (one split, two slices, one
  * zip_with — no per-word explode+self-join); the only corpus-wide shuffle
  * carries (bucket, isTarget) pre-aggregated per partition; the bucket
  * dictionary is ≤ `buckets` rows and broadcasts back onto the exploded
  * occurrences; per-doc scores are one map-side-combined groupBy. Nothing
  * driver-side, nothing quadratic, no vocabulary-sized state — the bucket
  * space is fixed at plan time, which is the point of hashed features.
  */
object Importance {

  /** Per-bucket integer importance weights from target-vs-raw bigram counts.
    * Returns (bucket, w) with w = ((c_target+1)·scale) div (c_raw+1).
    */
  def bucketWeights(occurrences: DataFrame, bucketCol: String,
                    isTargetCol: String, scale: Long): DataFrame =
    occurrences
      .groupBy(col(bucketCol))
      .agg(
        sum(when(col(isTargetCol), 1L).otherwise(0L)).as("__ct"),
        sum(when(col(isTargetCol), 0L).otherwise(1L)).as("__cr"))
      .select(col(bucketCol),
        expr(s"((__ct + 1) * $scale) div (__cr + 1)").as("w"))

  /** Hashed-bigram occurrences of every doc: (id, isTarget, bucket) — one
    * row per bigram occurrence, built row-locally.
    */
  def bigramBuckets(docs: DataFrame, idCol: String, textCol: String,
                    isTarget: Column, buckets: Int): DataFrame = {
    val ws = split(col(textCol), " ")
    docs
      .select(col(idCol), isTarget.as("__t"), ws.as("__ws"))
      .select(col(idCol), col("__t"),
        explode(zip_with(
          slice(col("__ws"), lit(1), size(col("__ws")) - 1),
          slice(col("__ws"), lit(2), size(col("__ws")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("__bg"))
      .select(col(idCol), col("__t"),
        TextFunctions.hashedTfIndex(col("__bg"), buckets).as("__b"))
  }

  /** Document importance scores: sum of the doc's bigram-occurrence bucket
    * weights. Returns (id, isTarget, n_bigrams, score) — callers select the
    * raw pool (`!isTarget`) and keep the top-k / threshold / sample by
    * `score`. Docs with no bigram (zero or one word) have no occurrence
    * rows and are absent — a selection policy that must retain them joins
    * this back to the pool with a default.
    */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
                       isTarget: Column, buckets: Int = 1024,
                       scale: Long = 1000000L): DataFrame = {
    val occ = bigramBuckets(docs, idCol, textCol, isTarget, buckets)
    val w = bucketWeights(occ, "__b", "__t", scale)
    // LANDED (r15, guide §2.4): the score frame is answer-sized (one row
    // per doc) and TWO declared consumers build it with identical arguments
    // (dsir_importance_topk, dsir_ess_audit) — unlanded, each ran the full
    // bigram explode + hash + weight fit per query (and the occurrence tree
    // twice within it: the weight arm + the scoring spine)
    graft.relational.Stages.materialize(
      occ
        .join(broadcast(w), "__b") // dictionary is bucket-bounded at plan time
        .groupBy(col(idCol), col("__t"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("w")).as("score"))
        .select(col(idCol), col("__t").as("is_target"),
          col("n_bigrams"), col("score")),
      "dsir_scores")
  }
}
