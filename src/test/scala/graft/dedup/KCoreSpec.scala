package graft.dedup

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(n: Seq[Long], es: Seq[(Long, Long)], k: Int, rounds: Int) =
    KCore.peelingTrace(n.toDF("id"), "id", es.toDF("a", "b"), "a", "b",
      k, rounds)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("triangle with a pendant: pendant peels round 1, triangle is the 2-core") {
    // 1-2-3 triangle, 4 hangs off 3, 5 isolated
    val out = run(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), k = 2, rounds = 4)
    assert(out(4L) === ((1L, 0L)))   // degree 1 → peeled round 1
    assert(out(5L) === ((1L, 0L)))   // isolated → peeled round 1
    assert(out(1L) === ((0L, 2L)))   // triangle survives with degree 2
    assert(out(2L) === ((0L, 2L)))
    assert(out(3L) === ((0L, 2L)))   // pendant removal drops 3 to degree 2
  }

  test("chain unravels one node... no — both ends each round (cascade)") {
    // path 1-2-3-4: ends have degree 1 → peel round 1; the two middles then
    // have degree 1 → round 2; nothing survives a 2-core of a path
    val out = run(Seq(1L, 2L, 3L, 4L),
      Seq((1L, 2L), (2L, 3L), (3L, 4L)), k = 2, rounds = 4)
    assert(out(1L)._1 === 1L && out(4L)._1 === 1L)
    assert(out(2L)._1 === 2L && out(3L)._1 === 2L)
    assert(out.values.forall(_._2 === 0L))
  }

  test("k=1 keeps every connected node, peels only isolates") {
    val out = run(Seq(1L, 2L, 3L), Seq((1L, 2L)), k = 1, rounds = 2)
    assert(out(1L) === ((0L, 1L)))
    assert(out(2L) === ((0L, 1L)))
    assert(out(3L) === ((1L, 0L)))
  }
}
