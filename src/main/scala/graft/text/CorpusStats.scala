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
    val merged = perDocStats.join(newTerms, Seq("bucket"), "left")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
    val (c1, _) = graft.relational.PrefixSum.runningSum(
      merged, "bucket", "new_terms", "cum_vocab")
    val (c2, _) = graft.relational.PrefixSum.runningSum(
      c1, "bucket", "n_tokens", "cum_tokens")
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
}
