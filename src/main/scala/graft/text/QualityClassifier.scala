package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality filtering: a multinomial Naive Bayes
  * bag-of-words classifier, the distributed shape of the fastText-style
  * linear quality filters the major LLM corpora were built with (GPT-3's
  * WebText-vs-crawl classifier, Brown et al. 2020 appendix A; LLaMA's
  * Wikipedia-reference classifier, Touvron et al. 2023 §2; CCNet pairs the
  * same idea with its LM — Wenzek et al. 2019). Training IS an aggregation
  * — per-class token counts — so the trained model falls out of one corpus
  * pass, and scoring is one vocabulary join: both ends stay declarative.
  *
  * Determinism (the repo-wide oracle rule): class likelihoods are
  * integer-bits surprisals — cost_c(t) = ⌊log₂((T_c + V) ÷ (ct_c + 1))⌋
  * computed as length(bin(·)) − 1 on BIGINT Laplace ratios (T_c = total
  * token occurrences in class c, ct_c = occurrences of t in c, V =
  * vocabulary size; the ratio is ≥ 1 since ct_c ≤ T_c). A document's class
  * cost is Σ tf(t)·cost_c(t) — an order-free integer sum, hash-exact in
  * any engine. The argmax over two integer costs (ties → negative) is the
  * classifier decision; class priors are omitted (a constant per class —
  * it shifts every document identically and the margin column absorbs it).
  *
  * Scale: one corpus explode feeds a map-side-combined (doc, token) count;
  * the class-count table is vocabulary-sized and is landed durably
  * ([[graft.relational.Stages.materialize]]) because it is consumed twice
  * (totals + weights) with different prunings — exchange reuse would
  * silently recompute it (measured on the CCNet scorer). Scoring joins the
  * compact tf frame to the weight table on the token — AQE broadcasts it
  * while the vocabulary fits, and degrades to a plain shuffle join when it
  * doesn't; nothing is driver-sided either way.
  */
object QualityClassifier {

  /** Per-class token counts: (t, cpos, cneg) — the trained model, one
    * corpus pass, vocabulary-sized output.
    */
  def classCounts(docs: DataFrame, idCol: String, textCol: String,
                  isPositive: Column): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), isPositive.as("lab"),
        explode(split(col(textCol), " ")).as("t"))
      .groupBy(col("t"))
      .agg(sum(when(col("lab"), 1L).otherwise(0L)).as("cpos"),
        sum(when(col("lab"), 0L).otherwise(1L)).as("cneg"))

  /** Integer-bits weight table from [[classCounts]]: (t, bp, bn) where bp/bn
    * are the per-occurrence surprisal of t under the positive/negative
    * class model.
    */
  def tokenBits(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("cpos")).as("tp"), sum(col("cneg")).as("tn"),
      count(lit(1)).as("v"))
    counts.crossJoin(broadcast(tot))
      .select(col("t"),
        (length(bin(expr("(tp + v) div (cpos + 1)"))) - 1).cast("long").as("bp"),
        (length(bin(expr("(tn + v) div (cneg + 1)"))) - 1).cast("long").as("bn"))
  }

  /** Score every document under both class models: (doc_id, n_tokens,
    * bits_pos, bits_neg, margin_bits, predicted). Lower bits = better fit;
    * margin_bits = bits_neg − bits_pos > 0 means the positive class
    * explains the document more cheaply. `predicted` breaks ties negative
    * (deterministic). Self-scoring the training corpus is the standard
    * curation shape — the filter is then applied to held-out raw data by
    * passing a different `docs`.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            isPositive: Column): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("cnt"))
    val model = graft.relational.Stages.materialize(
      classCounts(docs, idCol, textCol, isPositive), "nb_class_counts")
    // the scored frame itself lands too: five gated consumers (rank
    // normalization + its probe, PR sweep, calibration bins, kappa) each
    // read it 1-3 times, and the tokenize+join upstream would re-derive
    // per consumer read — one compact doc-sized landing per (docs,
    // isPositive) instead
    graft.relational.Stages.materialize(
      tf.join(tokenBits(model), Seq("t"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"),
          sum(col("cnt") * col("bp")).as("bits_pos"),
          sum(col("cnt") * col("bn")).as("bits_neg"))
        .withColumn("margin_bits", col("bits_neg") - col("bits_pos"))
        .withColumn("predicted",
          when(col("bits_pos") < col("bits_neg"), lit("pos")).otherwise(lit("neg"))),
      "nb_scores")
  }

  /** Reliability table over [[score]] margins — the calibration audit a
    * quality filter needs before its threshold is trusted: exact decile
    * cutoffs of `margin_bits` (integer data ⇒ `percentile` midpoints are
    * k or k+0.5, exact in double — the repo's quantile-determinism rule),
    * rows binned by comparison against the broadcast 1-row cutoff array,
    * and per-bin actual-positive rates in exact permille. A monotone
    * pos_permille column is the "calibrated enough to threshold" signal.
    *
    * Scale: one percentile aggregation (answer-sized 1-row cutoff array,
    * broadcast back), one conditional-aggregation pass — no sort, no
    * window, no join beyond the 1-row broadcast.
    *
    * @param scored  [[score]] output joined with the actual label column
    * @param isPositive the ACTUAL label (not the prediction)
    */
  /** Precision/recall threshold sweep over [[score]] margins — the PR curve
    * that picks a quality filter's operating point: for every observed
    * margin value θ, the metrics of the rule "keep iff margin_bits ≥ θ".
    * Completes the classifier-audit family (confusion, calibration,
    * silhouette) in the same integer-exact style: permille precision,
    * recall, and F1 from exact cumulative integer counts.
    *
    * Scale: one conditional aggregation to the per-margin frame
    * (answer-sized — distinct integer margins), then cumulative counts via
    * the two-phase [[graft.relational.PrefixSum.runningSum]] on the NEGATED
    * margin (so the inclusive prefix is the ≥-θ tail) — no global window,
    * no per-threshold join against the corpus. Margins are unique in the
    * per-margin frame, satisfying the prefix-sum id contract.
    *
    * @param scored [[score]] output joined with the actual label column
    * @param isPositive the ACTUAL label (not the prediction)
    */
  def prSweep(scored: DataFrame, isPositive: Column): DataFrame = {
    val perM = scored.withColumn("__pos", isPositive)
      .groupBy(col("margin_bits"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__pos"), 1L).otherwise(0L)).as("np"))
      .withColumn("__negm", -col("margin_bits"))
    // ONE fused prefix-sum model for both cumulative counts: two chained
    // single-column calls paid 4 sequential driver-synchronous model jobs
    // (bounds + totals, twice) — the r13 driver bench showed that structure
    // as nb_pr_sweep's both-passes slowdown (1.57/2.32 s vs 0.48 s close);
    // the fused call pays 2, and both window sums share one WindowExec.
    val (c2, totalsBoth) = graft.relational.PrefixSum.runningSums(
      perM, "__negm", Seq("n" -> "pred_pos", "np" -> "tp"))
    val totalPos = totalsBoth(1)
    val prec = expr("(1000L * tp) div pred_pos") // pred_pos ≥ 1 (own row)
    val rec =
      if (totalPos == 0L) lit(0L) else expr(s"(1000L * tp) div ${totalPos}L")
    c2.select(col("margin_bits").as("threshold"), col("pred_pos"), col("tp"))
      .withColumn("precision_permille", prec)
      .withColumn("recall_permille", rec)
      .withColumn("f1_permille",
        when(col("precision_permille") + col("recall_permille") === 0, lit(0L))
          .otherwise(expr("(2L * precision_permille * recall_permille) div " +
            "(precision_permille + recall_permille)")))
  }

  def calibrationBins(scored: DataFrame, isPositive: Column,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need at least two bins")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val cuts = scored.agg(
      expr(s"percentile(margin_bits, array(${qs.mkString(",")}))").as("__cs"))
    scored.withColumn("__pos", isPositive)
      .crossJoin(broadcast(cuts))
      .withColumn("bin", (1 until nBins).map(i =>
        when(col("margin_bits") > element_at(col("__cs"), i), 1L).otherwise(0L))
        .reduce(_ + _))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        min("margin_bits").as("margin_min"),
        max("margin_bits").as("margin_max"))
      .withColumn("pos_permille", expr("(1000L * n_pos) div n_docs"))
  }
}
