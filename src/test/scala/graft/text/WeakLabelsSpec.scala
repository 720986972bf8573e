package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeakLabelsSpec extends SparkSpec {
  import spark.implicits._

  private val lfs = Seq(
    "lf_a" -> when(col("x") > 0, 1L).otherwise(-1L),
    "lf_b" -> when(col("y") > 0, 1L).when(col("y") < 0, -1L).otherwise(0L),
    "lf_c" -> lit(0L))

  test("majority vote with deterministic tie -> abstain") {
    val d = Seq(
      (1L, 1, 1),   // +1, +1, 0 → pos
      (2L, -1, -1), // −1, −1, 0 → neg
      (3L, 1, -1),  // +1, −1, 0 → tie → abstain
      (4L, -1, 0))  // −1, 0, 0 → neg
      .toDF("doc_id", "x", "y")
    val out = WeakLabels.majorityVote(d, lfs)
      .select("doc_id", "votes_pos", "votes_neg", "n_abstain", "label")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) === ((2L, 0L, 1L, "pos")))
    assert(out(2L) === ((0L, 2L, 1L, "neg")))
    assert(out(3L) === ((1L, 1L, 1L, "abstain")))
    assert(out(4L) === ((0L, 1L, 2L, "neg")))
  }

  test("cohen kappa: hand-computed, and empty frame reports zeros") {
    // raters: a = {T,T,F,F}, b = {T,F,F,F} → agree 3 → po = 750‰
    // pe = (2·1 + 2·3)/16 = 500‰ → kappa = 1000·250/500 = 500‰
    val d = Seq((true, true), (true, false), (false, false), (false, false))
      .toDF("a", "b")
    val out = WeakLabels.cohenKappa(d, col("a"), col("b"))
      .select("n", "po_permille", "pe_permille", "kappa_permille")
      .as[(Long, Long, Long, Long)].head()
    assert(out === ((4L, 750L, 500L, 500L)))
    val empty = WeakLabels.cohenKappa(
      Seq.empty[(Boolean, Boolean)].toDF("a", "b"), col("a"), col("b"))
      .select("po_permille", "kappa_permille").as[(Long, Long)].head()
    assert(empty === ((0L, 0L)))
  }

  test("agreement matrix counts co-votes only; all-abstain pair reports 0") {
    val d = Seq((1L, 1, 1), (2L, -1, -1), (3L, 1, -1), (4L, -1, 0))
      .toDF("doc_id", "x", "y")
    val voted = WeakLabels.majorityVote(d, lfs)
    val m = WeakLabels.agreementMatrix(voted, lfs.map(_._1))
      .select("lf_a", "lf_b", "n_both", "n_agree", "n_conflict", "agree_permille")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // a vs b co-vote on docs 1,2,3 (doc 4's b abstains): agree 1,2; conflict 3
    assert(m(("lf_a", "lf_b")) === ((3L, 2L, 1L, 666L)))
    // lf_c always abstains → zero co-votes, guarded 0 permille
    assert(m(("lf_a", "lf_c")) === ((0L, 0L, 0L, 0L)))
    assert(m(("lf_b", "lf_c")) === ((0L, 0L, 0L, 0L)))
  }

  test("fleiss kappa: unanimity across categories scores 1000") {
    // d1 all-pos (3,0,0), d2 all-neg (0,3,0): P̄ = 1, P̄e = 1/2 → κ = 1
    val d = Seq((3L, 0L, 0L), (0L, 3L, 0L))
      .toDF("votes_pos", "votes_neg", "n_abstain")
    val out = WeakLabels.fleissKappa(d, k = 3)
      .select("n_docs", "n_raters", "pbar_permille", "pe_permille", "kappa_permille")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out === ((2L, 3L, 1000L, 500L, 1000L)))
  }

  test("fleiss kappa: hand-computed mixed case is exactly -125 permille") {
    // docs (2,1,0), (1,1,1), (3,0,0): A = 8, M = 18 → P̄ = 444‰;
    // S = (6,2,1), T² = 81, ΣS² = 41 → P̄e = 506‰;
    // κ = (8·81 − 18·41)/(18·40) = −90/720 → −125‰ exact (negative kappa)
    val d = Seq((2L, 1L, 0L), (1L, 1L, 1L), (3L, 0L, 0L))
      .toDF("votes_pos", "votes_neg", "n_abstain")
    val out = WeakLabels.fleissKappa(d, k = 3)
      .select("pbar_permille", "pe_permille", "kappa_permille")
      .as[(Long, Long, Long)].head()
    assert(out === ((444L, 506L, -125L)))
  }

  test("fleiss kappa: degenerate unanimous-single-category guards to 0") {
    val d = Seq((3L, 0L, 0L), (3L, 0L, 0L))
      .toDF("votes_pos", "votes_neg", "n_abstain")
    assert(WeakLabels.fleissKappa(d, k = 3)
      .select("kappa_permille").as[Long].head() === 0L)
  }

  test("fleiss kappa parity vs a sequential BigInt rational on random votes") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 4) {
      val k = 2 + trial // raters 3..6
      val rows = (1 to 50).map { _ =>
        val np = rnd.nextInt(k + 1)
        val nn = rnd.nextInt(k - np + 1)
        (np.toLong, nn.toLong, (k - np - nn).toLong)
      }
      val n = BigInt(rows.size)
      val a = rows.map { case (p, q, r) => BigInt(p * p + q * q + r * r - k) }.sum
      val sp = BigInt(rows.map(_._1).sum)
      val sn = BigInt(rows.map(_._2).sum)
      val sa = BigInt(rows.map(_._3).sum)
      val t2 = (n * k) * (n * k)
      val ss = sp * sp + sn * sn + sa * sa
      val m = n * k * (k - 1)
      val want = (
        (1000 * a / m).toLong,
        (1000 * ss / t2).toLong,
        if (t2 == ss) 0L else (1000 * (a * t2 - m * ss) / (m * (t2 - ss))).toLong)
      val got = WeakLabels.fleissKappa(
        rows.toDF("votes_pos", "votes_neg", "n_abstain"), k)
        .select("pbar_permille", "pe_permille", "kappa_permille")
        .as[(Long, Long, Long)].head()
      assert(got === want, s"trial $trial (k=$k)")
    }
  }
}
