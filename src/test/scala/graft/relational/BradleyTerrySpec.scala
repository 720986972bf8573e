package graft.relational

import graft.SparkSpec

class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  test("two items converge to the exact 3:1 odds fixed point") {
    // A beats B 3×, B beats A 1×: true BT odds are 3:1. Round 1:
    // den = (10⁶·4) div 2·10⁶ = 2 for both, raw_A = 1.5e6, raw_B = 5e5,
    // rescale → (10⁶, 333333); round 2 reproduces it — a fixed point the
    // remaining rounds hold exactly.
    val pairs = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")))
      .toDF("winner", "loser")
    val out = BradleyTerry.strengths(pairs, "winner", "loser", rounds = 4)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("A", 3L, 4L, 1000000L), ("B", 1L, 4L, 333333L)))
  }

  test("a symmetric cycle fits equal strengths") {
    // rock-paper-scissors with equal win counts: no item is stronger.
    val pairs = Seq.fill(2)(Seq(("A", "B"), ("B", "C"), ("C", "A"))).flatten
      .toDF("winner", "loser")
    val out = BradleyTerry.strengths(pairs, "winner", "loser", rounds = 4)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("A", 2L, 4L, 1000000L), ("B", 2L, 4L, 1000000L),
      ("C", 2L, 4L, 1000000L)))
  }

  test("never-winning items and unbounded universes fail loudly") {
    val oneSided = Seq(("A", "B"), ("A", "B")).toDF("winner", "loser")
    val e1 = intercept[IllegalArgumentException] {
      BradleyTerry.strengths(oneSided, "winner", "loser", rounds = 2)
    }
    assert(e1.getMessage.contains("never wins"))
    val pairs = Seq(("A", "B"), ("B", "A"), ("C", "A"), ("A", "C"))
      .toDF("winner", "loser")
    val e2 = intercept[IllegalArgumentException] {
      BradleyTerry.strengths(pairs, "winner", "loser", rounds = 2, maxItems = 1)
    }
    assert(e2.getMessage.contains("cells"))
  }
}
