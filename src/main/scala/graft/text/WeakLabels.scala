package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weak-supervision vote assembly (the Snorkel/data-programming shape,
  * Ratner 2017): k labeling functions (LFs) each emit +1 / −1 / 0-abstain
  * per document; documents get the majority-vote label, and the LF set gets
  * the pairwise agreement/conflict audit that tells you which heuristics
  * are redundant and which disagree — the quality-filter COMMITTEE view,
  * where the library's individual signals (lang-id, quality score, entropy,
  * Gopher gates) become voters instead of lone gatekeepers.
  *
  * Everything is exact integer arithmetic: votes are {−1, 0, +1} columns,
  * the majority label is a sign over an integer sum with deterministic
  * tie→abstain, agreements are conditional counts with permille ratios.
  *
  * Scale: votes are row-local column expressions over whatever per-doc
  * frame the caller assembled — vote assembly adds ZERO shuffles; the
  * majority view is a projection; the k×k agreement matrix unions k²/2
  * conditional aggregations over one landed vote frame (k is single-digit
  * — the matrix is answer-sized).
  */
object WeakLabels {

  /** Per-doc vote columns + majority verdict: input columns plus one `lf_i`
    * column per function, `votes_pos`, `votes_neg`, `n_abstain`, and
    * `label` ∈ {"pos", "neg", "abstain"} (sum 0 → abstain).
    */
  def majorityVote(df: DataFrame, lfs: Seq[(String, Column)]): DataFrame = {
    require(lfs.nonEmpty, "need at least one labeling function")
    val withVotes = lfs.foldLeft(df) { case (acc, (name, c)) =>
      acc.withColumn(name, c.cast("long"))
    }
    val names = lfs.map(_._1)
    val pos = names.map(n => when(col(n) === 1L, 1L).otherwise(0L)).reduce(_ + _)
    val neg = names.map(n => when(col(n) === -1L, 1L).otherwise(0L)).reduce(_ + _)
    withVotes
      .withColumn("votes_pos", pos)
      .withColumn("votes_neg", neg)
      .withColumn("n_abstain", lit(names.size.toLong) - pos - neg)
      .withColumn("label",
        when(col("votes_pos") > col("votes_neg"), "pos")
          .when(col("votes_neg") > col("votes_pos"), "neg")
          .otherwise("abstain"))
  }

  /** Cohen's kappa between two BOOLEAN raters — chance-corrected agreement
    * (raw agreement flatters raters that both say "yes" to everything; the
    * [[agreementMatrix]] gives raw co-vote agreement, this corrects it).
    * All arithmetic is exact integer permille: po = 1000·agree/n, pe from
    * the marginals over n², kappa = 1000·(po − pe)/(1000 − pe); a
    * degenerate pe = 1000 (both raters constant) reports kappa 0.
    * One conditional-aggregation pass, 1-row output.
    */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(when(a, 1L).otherwise(0L)).as("a_yes"),
      sum(when(b, 1L).otherwise(0L)).as("b_yes"),
      sum(when(a === b, 1L).otherwise(0L)).as("n_agree"))
    // empty-frame guard: n = 0 would raise DIVIDE_BY_ZERO under ANSI —
    // report the degenerate all-zero row instead of failing the audit
    agg
      .withColumn("po_permille",
        when(col("n") === 0, lit(0L))
          .otherwise(expr("(1000L * n_agree) div n")))
      .withColumn("pe_permille",
        when(col("n") === 0, lit(0L)).otherwise(
          expr("(1000L * (a_yes * b_yes + (n - a_yes) * (n - b_yes))) div (n * n)")))
      .withColumn("kappa_permille",
        when(col("pe_permille") === 1000L, lit(0L))
          .otherwise(expr(
            "(1000L * (po_permille - pe_permille)) div (1000L - pe_permille)")))
  }

  /** Fleiss' kappa over a [[majorityVote]] frame — the MULTI-rater
    * generalization of [[cohenKappa]] (Fleiss 1971): chance-corrected
    * agreement of ALL k labeling functions at once over the three
    * categories {+1, −1, abstain}, the one number that says whether the
    * committee agrees more than its marginal vote rates would produce by
    * chance. Pairwise matrices (the [[agreementMatrix]]) can look fine
    * while the committee as a whole is chance-level; Fleiss is the
    * committee-level verdict.
    *
    * Exact integer arithmetic end to end: with n_ic the per-doc category
    * counts (votes_pos, votes_neg, n_abstain — they sum to k),
    * A = Σ_i(Σ_c n_ic² − k) gives P̄ = A/(N·k(k−1)); S_c = Σ_i n_ic and
    * T = N·k give P̄e = ΣS_c²/T²; kappa = (A·T² − Nk(k−1)·ΣS_c²) /
    * (Nk(k−1)·(T² − ΣS_c²)) — one rational with integer terms, emitted in
    * truncating-division permille (negative kappas included, the
    * [[cohenKappa]] discipline). Products run in DECIMAL(38,0): A·T² ≤
    * N³k⁴ passes 2⁶³ near N ≈ 10⁶ docs, far below any real corpus.
    * One aggregation pass, 1-row output; degenerate P̄e = 1 (every rater
    * constant and unanimous) reports 0 like Cohen's.
    */
  def fleissKappa(voted: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "Fleiss' kappa needs at least two raters")
    val sumsq = col("votes_pos") * col("votes_pos") +
      col("votes_neg") * col("votes_neg") +
      col("n_abstain") * col("n_abstain")
    val agg = voted.agg(
      count(lit(1)).as("n_docs"),
      sum(sumsq).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("__sq"),
      sum(col("votes_pos")).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("__sp"),
      sum(col("votes_neg")).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("__sn"),
      sum(col("n_abstain")).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("__sa"))
    agg
      .withColumn("n_raters", lit(k.toLong))
      .withColumn("__a", col("__sq") - col("n_docs") * lit(k.toLong))
      // T² squares in DECIMAL — (Nk)² passes 2⁶³ already at N ≈ 10⁹ long
      .withColumn("__t2", {
        val t = (col("n_docs") * lit(k.toLong))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
        t * t
      })
      .withColumn("__ss",
        col("__sp") * col("__sp") + col("__sn") * col("__sn") +
          col("__sa") * col("__sa"))
      .withColumn("__m",
        (col("n_docs") * lit((k * (k - 1)).toLong))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .withColumn("pbar_permille",
        when(col("n_docs") === 0, lit(0L))
          .otherwise(expr("(1000 * __a) div __m")))
      .withColumn("pe_permille",
        when(col("n_docs") === 0, lit(0L))
          .otherwise(expr("(1000 * __ss) div __t2")))
      .withColumn("kappa_permille",
        when(col("n_docs") === 0 || col("__t2") === col("__ss"), lit(0L))
          .otherwise(expr(
            "(1000 * (__a * __t2 - __m * __ss)) div (__m * (__t2 - __ss))")))
      .select(col("n_docs"), col("n_raters"), col("pbar_permille"),
        col("pe_permille"), col("kappa_permille"))
  }

  /** Pairwise LF audit over a [[majorityVote]] frame: for each unordered LF
    * pair (lf_a < lf_b by name): n_both (both voted), n_agree, n_conflict,
    * agree_permille (of n_both; 0 when neither ever co-votes), plus each
    * side's coverage (non-abstain count). One conditional aggregation per
    * pair over the same frame, unioned — k²/2 answer-sized scans; land the
    * vote frame first when k is large (it never is).
    */
  def agreementMatrix(voted: DataFrame, lfNames: Seq[String]): DataFrame = {
    require(lfNames.size >= 2, "need at least two labeling functions")
    val pairs = for {
      i <- lfNames.indices; j <- lfNames.indices if i < j
    } yield (lfNames(i), lfNames(j))
    // r16 (guide §2.4): ONE conditional-aggregation pass computes all
    // k²/2 × 5 pair counts; the matrix rows explode out of the single-row
    // result. The r15 shape ran one full pass over the vote frame per pair
    // (3 scans + 3 aggregation exchanges for k = 3).
    val aggCols = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val bothVoted = col(a) =!= 0L && col(b) =!= 0L
      Seq(
        sum(when(col(a) =!= 0L, 1L).otherwise(0L)).as(s"__cova$i"),
        sum(when(col(b) =!= 0L, 1L).otherwise(0L)).as(s"__covb$i"),
        sum(when(bothVoted, 1L).otherwise(0L)).as(s"__both$i"),
        sum(when(bothVoted && col(a) === col(b), 1L).otherwise(0L)).as(s"__agree$i"),
        sum(when(bothVoted && col(a) =!= col(b), 1L).otherwise(0L)).as(s"__conf$i"))
    }
    voted.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(pairs.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(a).as("lf_a"), lit(b).as("lf_b"),
          coalesce(col(s"__cova$i"), lit(0L)).as("cov_a"),
          coalesce(col(s"__covb$i"), lit(0L)).as("cov_b"),
          coalesce(col(s"__both$i"), lit(0L)).as("n_both"),
          coalesce(col(s"__agree$i"), lit(0L)).as("n_agree"),
          coalesce(col(s"__conf$i"), lit(0L)).as("n_conflict"))
      }: _*)).as("__r"))
      .select(col("__r.*"))
      .withColumn("agree_permille",
        when(col("n_both") === 0, lit(0L))
          .otherwise(expr("(1000L * n_agree) div n_both")))
  }
}
