package graft.dedup

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def run(n: Seq[Long], es: Seq[(Long, Long)], rounds: Int) =
    LabelProp.communities(n.toDF("id"), "id", es.toDF("a", "b"), "a", "b", rounds)
      .as[(Long, Long)].collect().toMap

  test("two cliques joined by one bridge edge keep distinct communities") {
    // clique {1,2,3}, clique {10,11,12}, bridge 3-10: within each clique the
    // min label dominates by count; the bridge carries only one vote, so the
    // deterministic (count desc, label asc) argmax keeps the cliques apart
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val out = run(Seq(1L, 2L, 3L, 10L, 11L, 12L), es, rounds = 4)
    assert(Set(out(1L), out(2L), out(3L)).size === 1)
    assert(Set(out(10L), out(11L), out(12L)).size === 1)
    assert(out(1L) !== out(10L), s"cliques merged: $out")
  }

  test("isolated node keeps its own label") {
    val out = run(Seq(1L, 2L, 9L), Seq((1L, 2L)), rounds = 3)
    assert(out(9L) === 9L)
  }

  test("synchronous update: star center adopts the unanimous leaf label") {
    // star: center 5, leaves 1..4 — round 1: every leaf sees only the
    // center (label 5) and adopts 5; the center sees four distinct leaf
    // labels and takes the smallest (1). Round 2: leaves (now 5) see the
    // center's 1 → adopt 1; center sees four 5s → adopts 5... the
    // oscillation is deterministic; after 4 (even) rounds leaves carry the
    // center's round-3 label and the center is back to 5
    val out = run(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L)), rounds = 4)
    assert(out(5L) === 5L)
    assert(Seq(1L, 2L, 3L, 4L).map(out).toSet === Set(1L))
  }
}
