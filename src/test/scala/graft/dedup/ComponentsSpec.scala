package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  maxIters: Int = 25,
                  driverEdgeCap: Long = 262144L): Map[Long, Long] =
    Components.connectedComponents(
      nodes.toDF("id"), "id",
      edges.toDF("a", "b"), "a", "b", maxIters, driverEdgeCap)
      .as[(Long, Long)].collect().toMap

  test("triangle + chain + singleton resolve to min-id components") {
    // exercised on BOTH physical paths: the bounded-graph union-find
    // dispatch and (cap = 0) the iterative hook-and-contract loop
    for (cap <- Seq(262144L, 0L)) {
      val got = run(
        nodes = 1L to 8L,
        edges = Seq((2L, 3L), (3L, 4L), (2L, 4L), // triangle {2,3,4}
          (5L, 6L), (6L, 7L)),                    // chain {5,6,7}
        driverEdgeCap = cap)
      assert(got(1L) === 1L && got(8L) === 8L)    // singletons
      assert(Seq(2L, 3L, 4L).map(got) === Seq(2L, 2L, 2L))
      assert(Seq(5L, 6L, 7L).map(got) === Seq(5L, 5L, 5L))
    }
  }

  test("long path converges within O(log n) rounds via pointer jumping") {
    val n = 64L
    val path = (1L until n).map(i => (i, i + 1))
    // plain min propagation would need ~63 rounds; jumping needs ~log2(63)+2.
    // maxIters = 12 fails if the compression isn't actually working.
    // cap = 0 forces the iterative path — the default would short-circuit
    // this small graph to the driver and prove nothing about jumping.
    val got = run(1L to n, path, maxIters = 12, driverEdgeCap = 0L)
    assert(got.values.toSet === Set(1L))
  }

  test("merge order does not matter: worst-case labels still reach the min") {
    // high ids point at low ids through a hub; min sits at a leaf
    for (cap <- Seq(262144L, 0L)) {
      val got = run(Seq(10L, 20L, 30L, 40L, 1L),
        Seq((40L, 30L), (30L, 20L), (20L, 10L), (10L, 1L)),
        driverEdgeCap = cap)
      assert(got.values.toSet === Set(1L))
    }
  }

  test("union-find dispatch agrees with the iterative path on a random graph") {
    val rnd = new scala.util.Random(7)
    val nodes = 1L to 200L
    val edges = Seq.fill(150)((rnd.nextInt(200) + 1L, rnd.nextInt(200) + 1L))
      .filter { case (a, b) => a != b }
    val fast = run(nodes, edges)
    val slow = run(nodes, edges, driverEdgeCap = 0L)
    assert(fast === slow)
  }

  test("union-find dispatch handles edge-only ids like the iterative path") {
    // edges reference id 99 which is absent from nodes: connectivity
    // THROUGH it must still merge 1 and 2, and 99 itself stays out
    val nodes = Seq(1L, 2L, 3L)
    val edges = Seq((1L, 99L), (99L, 2L))
    val fast = run(nodes, edges)
    val slow = run(nodes, edges, driverEdgeCap = 0L)
    assert(fast === slow)
    assert(fast(1L) === 1L && fast(2L) === 1L && fast(3L) === 3L)
    assert(!fast.contains(99L))
  }

  test("componentSummary reports only multi-member groups with checksums") {
    val labels = Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 4L)).toDF("id", "comp")
    val got = Components.componentSummary(labels)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((2L, 2L, 5L)))
  }

  test("canonicalPerComponent picks max score, ties toward the smaller id") {
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),  // comp 1: scores 5, 9, 9 -> id 2 wins tie
      (4L, 4L), (5L, 4L),            // comp 4: scores 7, 3 -> id 4
      (6L, 6L)                       // singleton: excluded
    ).toDF("id", "comp")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 7L), (5L, 3L), (6L, 1L))
      .toDF("id", "score")
    val got = Components.canonicalPerComponent(labels, scores, "id", "score")
      .orderBy("comp")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 2L, 9L), (4L, 2L, 4L, 7L)))
  }

  test("incremental merge equals the full recompute on random graph splits") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 4) {
      val n = 30 + trial * 10
      val nodes = (1L to n.toLong).toSeq
      val edges = Iterator.continually {
        val a = rnd.nextInt(n).toLong + 1L
        val b = rnd.nextInt(n).toLong + 1L
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).take(n * 3).toSeq.distinct
      val cut = n / 2 + rnd.nextInt(5) // old = ids <= cut, new = rest
      val full = Components.connectedComponents(
        nodes.toDF("id"), "id", edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      val oldLabels = Components.connectedComponents(
        nodes.filter(_ <= cut).toDF("id"), "id",
        edges.filter(e => e._1 <= cut && e._2 <= cut).toDF("a", "b"), "a", "b")
      val merged = Components.incrementalComponents(
        oldLabels, nodes.filter(_ > cut).toDF("id"), "id",
        edges.filter(e => e._1 > cut || e._2 > cut).toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(merged === full, s"trial $trial (cut $cut)")
    }
  }
}
