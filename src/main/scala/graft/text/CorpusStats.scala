package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-growth and term-dispersion statistics — the two classical
  * lexical diagnostics a corpus report carries:
  *
  *   - Heaps'-law vocabulary growth: distinct vocabulary as a function of
  *     corpus fraction consumed (in doc-id order). A flattening curve says
  *     more data adds little new vocabulary (dedup/diversity signal); a
  *     straight line says the corpus is still lexically open.
  *   - Church–Gale burstiness: terms whose occurrences CONCENTRATE in few
  *     documents (high tf/df) vs evenly-spread function words — the signal
  *     separating topical/boilerplate terms from glue.
  *
  * Determinism: growth buckets come from exact integer `percentile`
  * cutoffs over doc ids (midpoints exact in double — the
  * quality_decile_blend pattern); "new vocabulary" attributes each term to
  * the bucket of its FIRST-occurrence doc (min doc id — order-free);
  * cumulative columns ride the two-phase [[graft.relational.PrefixSum]]
  * (no global window). Burstiness is integer permille; idf is the
  * integer-bits discipline.
  *
  * Scale: one tf aggregation feeds both; growth adds a vocabulary-sized
  * min-aggregation and a 10-row rollup; burstiness a vocabulary-sized
  * rollup + TakeOrdered top-k.
  */
object CorpusStats {

  /** (bucket 1..nBuckets, n_docs, n_tokens, new_terms, cum_vocab,
    * cum_tokens) in doc-id order.
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2)
    val qs = (1 until nBuckets).map(i => s"${i.toDouble / nBuckets}").mkString(", ")
    val cuts = docs.agg(
      expr(s"percentile($idCol, array($qs))").as("__cs"))
    def bucketOf(c: org.apache.spark.sql.Column) =
      (1 until nBuckets).map(i =>
        when(c > element_at(col("__cs"), i), 1L).otherwise(0L))
        .reduce(_ + _) + 1L
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(split(col(textCol), " ")).as("t"))
    val perDocStats = docs.crossJoin(broadcast(cuts))
      .select(bucketOf(col(idCol)).as("bucket"),
        size(split(col(textCol), " ")).cast("long").as("nt"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val firstDoc = toks.groupBy(col("t")).agg(min(col("doc_id")).as("fd"))
    val newTerms = firstDoc.crossJoin(broadcast(cuts))
      .select(bucketOf(col("fd")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_terms"))
    // LAND the nBuckets-row bucket frame before the two prefix sums: each
    // runningSum issues bounded model jobs over its input, and as a plan
    // subtree `merged` re-derived all three corpus aggregation arms (cuts,
    // per-doc token counts, first-occurrence index) PER JOB — the r12
    // aux-job scan gate measured documents:9 across the four model jobs.
    // Landed, the arms run once; every later job reads nBuckets rows.
    val merged = graft.relational.Stages.materialize(
      perDocStats.join(newTerms, Seq("bucket"), "left")
        .withColumn("new_terms", coalesce(col("new_terms"), lit(0L))),
      "vocab_buckets")
    // one fused model for both cumulative columns (2 driver jobs, not 4 —
    // the nb_pr_sweep fold, see PrefixSum.runningSums)
    val (c2, _) = graft.relational.PrefixSum.runningSums(
      merged, "bucket", Seq("new_terms" -> "cum_vocab", "n_tokens" -> "cum_tokens"))
    c2.select("bucket", "n_docs", "n_tokens", "new_terms", "cum_vocab",
      "cum_tokens")
  }

  /** Top-`topK` burstiest terms at `minTf` support: (term, tf, df,
    * burst_permille = 1000·tf/df, idf_bits = ⌊log₂(n_docs div df)⌋).
    */
  def burstiness(docs: DataFrame, idCol: String, textCol: String,
                 minTf: Long, topK: Int): DataFrame = {
    require(topK > 0)
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("t"))
    val stats = toks.groupBy(col("t"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .filter(col("tf") >= minTf)
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    stats.crossJoin(broadcast(nDocs))
      .select(col("t").as("term"), col("tf"), col("df"),
        expr("(1000L * tf) div df").as("burst_permille"),
        (length(bin(expr("__n div df"))) - 1).cast("long").as("idf_bits"))
      .orderBy(desc("burst_permille"), col("term")).limit(topK)
  }

  /** Zipf rank-octave curve + fitted slope — does the corpus follow the
    * power law a natural-language corpus should (slope ≈ −1000 millibits
    * of frequency per rank octave), or is it distorted by boilerplate
    * (too flat at the head) or token soup (too heavy a tail)? The log-log
    * Zipf plot binned at octave resolution, libm-free: both axes use the
    * integer-bits discipline (bits(x) = ⌊log₂ x⌋), so no `log` call whose
    * rounding could differ across engines ever touches a compared value.
    *
    * The per-term rank is never materialized: terms are grouped into
    * FREQUENCY CLASSES (f, m = #terms at f); descending-frequency class
    * ranks occupy the contiguous block [r0+1, r0+m] (r0 = exclusive
    * prefix of m in f-desc order, via the two-phase [[graft.relational
    * .PrefixSum]] on id = −f — no global window), and the block's overlap
    * with each rank octave [2^o, 2^(o+1)−1] is counted arithmetically.
    * Work is distinct-frequency-sized (≈√(corpus tokens) classes), not
    * vocabulary-sized, after the one tf aggregation.
    *
    * Output: one row per occupied octave (octave, n_terms, total_count,
    * mean_freq_millibits) with the corpus-level OLS slope/corr of
    * mean_freq_millibits vs octave (computed by [[graft.relational
    * .Profile.groupedRegression]]'s exact-power-sums form) repeated on
    * each row.
    */
  def zipfOctaves(docs: DataFrame, textCol: String): DataFrame = {
    def bits(c: org.apache.spark.sql.Column) =
      (length(bin(c)) - lit(1)).cast("long")
    val tf = docs
      .select(explode(split(col(textCol), " ")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("f"))
    // classes feeds PrefixSum's two driver actions plus the span plan —
    // land it so the tf explode runs once, not once per action
    val classes = graft.relational.Stages.materialize(
      tf.groupBy(col("f")).agg(count(lit(1)).as("m")), "zipf_classes")
    val (cum, _) = graft.relational.PrefixSum.runningSum(
      classes.withColumn("__id", -col("f")), "__id", "m", "__cum")
    val spans = cum
      .withColumn("r0", col("__cum") - col("m"))
      .withColumn("o", explode(sequence(bits(col("r0") + 1),
        bits(col("r0") + col("m")))))
      // block [r0+1, r0+m] ∩ octave [2^o, 2^(o+1)−1], never empty by the
      // sequence bounds
      .withColumn("cnt",
        least(col("r0") + col("m"),
          expr("shiftleft(1L, CAST(o + 1 AS INT))") - 1) -
          greatest(col("r0") + 1, expr("shiftleft(1L, CAST(o AS INT))")) + 1)
    // oct feeds both the regression and the output rows
    val oct = graft.relational.Stages.materialize(
      spans.groupBy(col("o").as("octave"))
      .agg(sum(col("cnt")).as("n_terms"),
        sum(col("cnt") * col("f")).as("total_count"),
        sum(col("cnt") * bits(col("f"))).as("__sb"))
      .withColumn("mean_freq_millibits",
        expr("(1000L * __sb) div n_terms"))
      .drop("__sb"), "zipf_octaves")
    val reg = graft.relational.Profile.groupedRegression(
      oct.withColumn("__g", lit("corpus")), "__g",
      col("octave"), col("mean_freq_millibits"))
      .select(col("slope"), col("corr"))
    oct.crossJoin(broadcast(reg))
  }

  /** Vocabulary projection from the frequency-of-frequencies: Chao1's
    * lower bound on the UNSEEN type count and Good–Turing's unseen
    * probability mass — "how much vocabulary is this corpus still
    * missing?", the capture-recapture question Heaps' growth curve only
    * extrapolates visually. Bias-corrected Chao1 (Chao 1984; Colwell's
    * EstimateS form) so F₂ = 0 never divides by zero:
    *   chao1 = V + F₁(F₁−1) / (2(F₂+1)),
    * Good–Turing unseen mass = F₁/N (Gale & Sampson 1995) in permille —
    * both one truncating division from exact counts.
    *
    * Runs on word n-grams (`gramN`): the unit must be open-class for the
    * estimate to mean anything — this fixture's 31-word unigram
    * vocabulary is closed (F₁ = 0, estimate degenerate), its trigram
    * vocabulary is not (measured F₁ ≈ 9.4k of V ≈ 16k at sf0.01).
    * Scale: one row-local n-gram explode → tf aggregation →
    * frequency-class rollup (vocabulary-sized, then class-sized).
    */
  def vocabProjection(docs: DataFrame, textCol: String,
                      gramN: Int): DataFrame = {
    val tf = docs
      .select(split(col(textCol), " ").as("__ws"))
      .filter(size(col("__ws")) >= gramN)
      .select(explode(transform(
        sequence(lit(1), size(col("__ws")) - lit(gramN - 1)),
        i => array_join(slice(col("__ws"), i, lit(gramN)), " "))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("f"))
    tf.agg(
      count(lit(1)).as("vocab"),
      sum(col("f")).as("n_grams"),
      sum(when(col("f") === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when(col("f") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("vocab"), col("n_grams"), col("f1"), col("f2"),
        expr("vocab + (f1 * (f1 - 1L)) div (2L * (f2 + 1L))")
          .as("chao1_vocab_est"),
        expr("(1000L * f1) div n_grams").as("unseen_mass_permille"))
  }
}
