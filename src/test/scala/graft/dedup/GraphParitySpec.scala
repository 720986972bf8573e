package graft.dedup

import graft.SparkSpec

/** Fixed-seed randomized parity: the distributed k-core peel and LPA
  * rounds must equal a sequential driver simulation on random graphs —
  * the same fuzz discipline as the funnel/prefix-sum/CDC parity suites.
  */
class GraphParitySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  private def randomGraph(n: Int, m: Int): (Seq[Long], Seq[(Long, Long)]) = {
    val nodes = (1L to n.toLong).toSeq
    val edges = Iterator.continually {
      val a = rnd.nextInt(n).toLong + 1L
      val b = rnd.nextInt(n).toLong + 1L
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).take(m * 2).toSeq.distinct.take(m)
    (nodes, edges)
  }

  private def adj(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Seq[Long]] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    nodes.map(n => n -> sym.collect { case (u, v) if u == n => v }).toMap
  }

  private def seqKCore(nodes: Seq[Long], edges: Seq[(Long, Long)],
                       k: Int, rounds: Int): Map[Long, (Long, Long)] = {
    val nb = adj(nodes, edges)
    var alive = nodes.toSet
    var peeled = Map.empty[Long, Long]
    for (r <- 1 to rounds) {
      val out = alive.filter(n => nb(n).count(alive) < k)
      peeled ++= out.map(_ -> r.toLong)
      alive --= out
    }
    nodes.map { n =>
      n -> (if (alive(n)) (0L, nb(n).count(alive).toLong)
            else (peeled(n), 0L))
    }.toMap
  }

  private def seqLpa(nodes: Seq[Long], edges: Seq[(Long, Long)],
                     rounds: Int): Map[Long, Long] = {
    val nb = adj(nodes, edges)
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = nodes.map { n =>
        val votes = nb(n).map(lab).groupBy(identity).view
          .mapValues(_.size).toSeq
        n -> (if (votes.isEmpty) lab(n)
              else votes.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
    }
    lab
  }

  test("k-core peeling trace matches the sequential simulation on random graphs") {
    for (trial <- 1 to 4) {
      val (nodes, edges) = randomGraph(n = 30 + trial * 10, m = 60 + trial * 20)
      val want = seqKCore(nodes, edges, k = 2, rounds = 4)
      val got = KCore.peelingTrace(nodes.toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b", k = 2, rounds = 4)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === want, s"trial $trial: k-core diverged")
    }
  }

  test("LPA communities match the synchronous sequential simulation") {
    for (trial <- 1 to 4) {
      val (nodes, edges) = randomGraph(n = 25 + trial * 8, m = 50 + trial * 15)
      val want = seqLpa(nodes, edges, rounds = 4)
      val got = LabelProp.communities(nodes.toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b", rounds = 4)
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"trial $trial: LPA diverged")
    }
  }

  test("modularity ledger matches a sequential BigInt reference on random partitions") {
    for (trial <- 1 to 4) {
      val (nodes, edges) = randomGraph(n = 20 + trial * 10, m = 40 + trial * 15)
      // random ≤5-community partition
      val labels = nodes.map(n => n -> (rnd.nextInt(5).toLong + 1L))
      val m = BigInt(edges.size)
      val deg = nodes.map(n => n ->
        edges.count(e => e._1 == n || e._2 == n)).toMap
      val byComm = labels.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      val labOf = labels.toMap
      val terms = byComm.map { case (c, members) =>
        val dC = BigInt(members.map(deg).sum)
        val eC = BigInt(edges.count(e => labOf(e._1) == c && labOf(e._2) == c))
        c -> (members.size.toLong, eC, dC, 4 * m * eC - dC * dC)
      }
      val num = terms.values.map(_._4).sum
      val wantQ = (1000000 * num / (4 * m * m)).toLong
      val got = GraphMetrics.modularity(
        labels.toDF("id", "community"), "id", "community",
        edges.toDF("a", "b"), "a", "b")
        .select("community", "n_nodes", "internal_edges", "degree_sum",
          "q_contrib_micro", "modularity_micro")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      got.foreach { case (c, nn, ec, dc, qc, q) =>
        val (wn, wec, wdc, wterm) = terms(c)
        assert((nn, ec, dc) === ((wn, wec.toLong, wdc.toLong)), s"trial $trial comm $c")
        assert(qc === (1000000 * wterm / (4 * m * m)).toLong, s"trial $trial contrib $c")
        assert(q === wantQ, s"trial $trial total")
      }
    }
  }
}
