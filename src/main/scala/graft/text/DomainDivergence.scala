package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source unigram KL divergence from the corpus mixture, in the
  * library's integer-bits surprisal discipline — the domain-mixture signal
  * behind DSIR-style source weighting (Xie et al. 2023) read the other way
  * round: how far does each source's token distribution sit from the pool
  * it is mixed into? High KL = a distinctive domain (code, tables,
  * another register); near-zero = interchangeable with the mixture.
  *
  * Estimator: KL(p_s ‖ q) = H×(p_s, q) − H(p_s) with both entropies in
  * floor-log₂ bits — bits(x) = length(bin(x)) − 1 over BIGINT ratios
  * (`N div C_t` for the cross term, `n_s div c_t` for the own term), the
  * same libm-free form as [[Entropy]] / the NB classifier, hash-identical
  * in any engine. Flooring each term separately means the gap is a few
  * millibits biased and can dip BELOW zero for a source that matches the
  * mixture almost exactly — it is a ranking signal, not a metric; the
  * scaladoc'd contract is monotone-in-divergence, not nonnegativity.
  *
  * Scale: tf_s = one explode + (source, term) map-side-combined count;
  * the corpus table C_t is tf_s re-aggregated BY TERM (equi-shuffle on the
  * term key joins it back); per-source totals ride the source key; the
  * grand total N is a 1-row broadcast. No windows, no driver state, no
  * vocabulary collect — vocabulary stays distributed however large.
  */
object DomainDivergence {

  /** (source, n_tokens, n_terms, cross_entropy_bits, entropy_bits,
    * kl_millibits_per_token) per distinct `srcCol` value.
    */
  def perSourceKl(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    // tfS feeds FOUR consumers (the join spine, per-source totals, the
    // corpus term table, and the grand total) — without landing, each
    // re-runs the explode+count over the full corpus (the ReuseExchange
    // defeat the house Stages discipline exists for)
    val tfS = graft.relational.Stages.materialize(docs
      .select(col(srcCol).as("source"),
        explode(split(col(textCol), " ")).as("t"))
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("c")), "domdiv_tf")
    val totS = tfS.groupBy(col("source"))
      .agg(sum(col("c")).as("n_s"), count(lit(1)).as("n_terms"))
    val tfG = tfS.groupBy(col("t")).agg(sum(col("c")).as("cg"))
    val total = tfG.agg(sum(col("cg")).as("__n"))
    tfS
      .join(tfG, Seq("t"))
      .join(totS, Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("__cross", col("c") *
        (length(bin(expr("__n div cg"))) - 1).cast("long"))
      .withColumn("__own", col("c") *
        (length(bin(expr("n_s div c"))) - 1).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        max(col("n_terms")).as("n_terms"),
        sum(col("__cross")).as("cross_entropy_bits"),
        sum(col("__own")).as("entropy_bits"))
      .withColumn("kl_millibits_per_token",
        expr("(1000L * (cross_entropy_bits - entropy_bits)) div n_tokens"))
  }
}
