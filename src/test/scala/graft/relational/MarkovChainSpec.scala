package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarkovChainSpec extends SparkSpec {
  import spark.implicits._

  // A→A 1, A→B 1, B→A 1: out(A)=2, out(B)=1; true stationary (2/3, 1/3).
  private lazy val trans = Seq(
    ("A", "A", 1L), ("A", "B", 1L), ("B", "A", 1L))
    .toDF("from_type", "to_type", "n")
  private lazy val marginal = Seq(("A", 3L), ("B", 1L))
    .toDF("event_type", "n_events")

  test("micro rounds are exact: hand-computed 1- and 2-round iterates") {
    // from uniform (500000, 500000):
    // r1: raw(A)=500000//2+500000=750000, raw(B)=250000 → (750000, 250000)
    // r2: raw(A)=375000+250000=625000, raw(B)=375000 → (625000, 375000)
    val r1 = MarkovChain.stationaryMix(trans, marginal, rounds = 1)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r1 === Seq(("A", 3L, 750L, 750L), ("B", 1L, 250L, 250L)))
    val r2 = MarkovChain.stationaryMix(trans, marginal, rounds = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r2 === Seq(("A", 3L, 750L, 625L), ("B", 1L, 250L, 375L)))
  }

  test("a doubly-stochastic chain is a fixed point at every round count") {
    val cyc = Seq(("A", "B", 1L), ("B", "A", 1L))
      .toDF("from_type", "to_type", "n")
    for (r <- Seq(1, 5, 12)) {
      val got = MarkovChain.stationaryMix(cyc, marginal, rounds = r)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got === Seq(("A", 3L, 750L, 500L), ("B", 1L, 250L, 500L)))
    }
  }

  test("12 rounds converge to the 2/3-1/3 fixed point within a permille") {
    val got = MarkovChain.stationaryMix(trans, marginal, rounds = 12)
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, _, _, s) => k -> s }.toMap
    assert(math.abs(got("A") - 666L) <= 1L)
    assert(math.abs(got("B") - 333L) <= 1L)
  }

  test("misuse fails loudly: absorbing state, cell cap, empty") {
    val absorbing = Seq(("A", "B", 1L)).toDF("from_type", "to_type", "n")
    val e = intercept[IllegalArgumentException](
      MarkovChain.stationaryMix(absorbing, marginal))
    assert(e.getMessage.contains("absorbing"))
    intercept[IllegalArgumentException](
      MarkovChain.stationaryMix(trans, marginal, maxStates = 1))
    val empty = Seq.empty[(String, String, Long)]
      .toDF("from_type", "to_type", "n")
    intercept[IllegalArgumentException](
      MarkovChain.stationaryMix(empty, marginal))
  }
}
