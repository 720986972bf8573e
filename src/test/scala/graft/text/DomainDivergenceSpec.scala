package graft.text

import graft.SparkSpec

class DomainDivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("a source identical to the mixture has exactly zero KL") {
    // Two sources with the SAME text: N = 2·n_s and C_t = 2·c_t, and
    // floor(2a / 2b) = floor(a / b) — the cross and own bits cancel
    // term-for-term, so the integer estimator is exactly 0 (not just
    // small), despite the per-term floors.
    val docs = Seq(("s1", "a b b c"), ("s2", "a b b c"))
      .toDF("source", "text")
    val out = DomainDivergence.perSourceKl(docs, "source", "text")
      .orderBy("source")
      .select("source", "kl_millibits_per_token")
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("s1", 0L), ("s2", 0L)))
  }

  test("a divergent source scores above a mixture-matching one") {
    // s_odd's vocabulary is disjoint from the other two sources' and it is
    // small, so the matching pair dominates the mixture: for sA's terms
    // N div C_t = 55 div 16 = 3 matches the in-source ratio 24 div 8 = 3
    // bit-for-bit (kl exactly 0), while s_odd's singleton terms pay
    // bits(55) − bits(7) = 3 bits per token.
    val common = Seq.fill(8)("x y z").mkString(" ")
    val odd = "q r s t u v w"
    val docs = Seq(("sA", common), ("sB", common), ("s_odd", odd))
      .toDF("source", "text")
    val kl = DomainDivergence.perSourceKl(docs, "source", "text")
      .select("source", "kl_millibits_per_token")
      .as[(String, Long)].collect().toMap
    assert(kl("s_odd") > kl("sA"))
    assert(kl("sA") === kl("sB"))
  }

  test("totals are per-source token and distinct-term counts") {
    val docs = Seq(("s1", "a a b"), ("s1", "c"), ("s2", "a"))
      .toDF("source", "text")
    val out = DomainDivergence.perSourceKl(docs, "source", "text")
      .orderBy("source")
      .select("source", "n_tokens", "n_terms")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("s1", 4L, 3L), ("s2", 1L, 1L)))
  }
}
