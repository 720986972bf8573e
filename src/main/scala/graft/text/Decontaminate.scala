package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Eval-benchmark decontamination by k-gram overlap — the PaLM/GPT-4-style
  * check that TRAINING documents sharing long n-grams with an evaluation
  * benchmark are flagged (and usually dropped) so benchmark numbers stay
  * honest. Distinct from [[Sampling.leakageSafeSplit]] (which makes a
  * FUTURE split component-atomic): this audits a training corpus against a
  * FIXED, already-published eval set.
  *
  * Scale design: gram fingerprints are built ROW-LOCALLY (transform over
  * the split array — no explode-then-window shuffle; compare
  * [[graft.dedup.ExactSubstr.anchors]], which pays a per-doc window because
  * it needs token POSITIONS; overlap counting doesn't). The only shuffles
  * are the distinct on (doc, fp) and the semi-join against the eval gram
  * set — and in production the eval side is a few thousand benchmark
  * documents, so the join is a broadcast of the eval fingerprint set
  * against a map-side-only training scan. md5/64-bit fingerprints carry the
  * repo-wide accepted collision risk (~grams²/2⁶⁴).
  */
object Decontaminate {

  /** Distinct (doc_id, fp) for every full k-token window, built row-locally. */
  def docGrams(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, "gram width must be at least 2 tokens")
    val arr = split(col(textCol), " ")
    val grams = when(size(arr) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(arr) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(arr, i + j + 1)): _*)))
    docs
      .select(col(idCol).as("doc_id"), explode(grams).as("gram"))
      .select(col("doc_id"), substring(md5(col("gram")), 1, 16).as("fp"))
      .distinct()
  }

  /** Per-TRAINING-doc contamination report against the docs selected by
    * `isEval`: (doc_id, n_grams, n_hit, contam_permille, contaminated).
    * A training doc with zero full k-grams reports 0/0/0/false.
    */
  def report(docs: DataFrame, idCol: String, textCol: String, k: Int,
             isEval: Column, flagPermille: Long = 200): DataFrame = {
    val tagged = docs.withColumn("__eval", isEval)
    // The tagged gram index is consumed by BOTH the eval-fingerprint set
    // and the train side — as plan branches each re-derived the whole
    // row-local gram build (documents scanned 6× in one job, r12 aux-job
    // scan gate); landed, the gram build runs once and both sides read the
    // compact (doc_id, fp, __eval) stage.
    val g = graft.relational.Stages.materialize(
      docGrams(tagged, idCol, textCol, k)
        .join(tagged.select(col(idCol).as("doc_id"), col("__eval")), Seq("doc_id")),
      "decontam_grams")
    val evalFps = g.filter(col("__eval")).select("fp").distinct()
    val train = g.filter(!col("__eval"))
    val perDoc = train.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"))
    val hits = train.join(evalFps, Seq("fp"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    tagged.filter(!col("__eval"))
      .select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contam_permille",
        when(col("n_grams") === 0, lit(0L))
          .otherwise(expr("(1000L * n_hit) div n_grams")))
      .withColumn("contaminated", col("contam_permille") >= flagPermille)
  }
}
