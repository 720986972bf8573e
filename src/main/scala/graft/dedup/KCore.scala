package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling over an undirected graph — the community/coreness signal
  * on the kNN similarity graph: nodes surviving k-core peeling sit inside
  * densely inter-connected regions (clusters worth sampling around);
  * early-peeled nodes are periphery/noise (the coreset complement to
  * PageRank centrality, O26, and the triangle census, O48).
  *
  * The peel is the textbook iterative rule — repeatedly delete nodes whose
  * CURRENT degree is < k — run for a FIXED number of rounds, emitting for
  * each node the round it was peeled (0 = survived all rounds). A fixed
  * round count keeps the whole computation a finite chain of joins and
  * aggregations that an oracle replays as chained CTEs (the bpe_train_merges
  * precedent); coreness converges in few rounds on degree-bounded kNN graphs
  * (degree ≤ 2k after symmetrization bounds every join fan-out).
  *
  * Scale: the edge list is degree-bounded (n·k rows); each round is one
  * degree aggregation + two semi/anti joins, all equi-keyed on node id —
  * co-partitioned after the first round's exchange. The edge frame is landed
  * once by the caller (see the declared query) so rounds don't re-derive it.
  */
object KCore {

  /** Peeling trace: (id, peel_round ∈ 0..rounds, final_degree) — peel_round
    * = the 1-based round the node was removed, 0 if it survived;
    * final_degree = its degree among survivors (0 for peeled nodes).
    * `nodes` must carry distinct ids in column `idCol`; `edges` undirected
    * pairs (aCol, bCol), one row per unordered pair.
    */
  def peelingTrace(nodes: DataFrame, idCol: String,
                   edges: DataFrame, aCol: String, bCol: String,
                   k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val n0 = nodes.select(col(idCol).as("id"))
    val sym = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(edges.select(col(bCol).as("u"), col(aCol).as("v")))
    var alive = n0
    var trace = n0.withColumn("peel_round", lit(0L))
    for (r <- 1 to rounds) {
      val aliveEdges = sym
        .join(alive.select(col("id").as("u")), Seq("u"), "left_semi")
        .join(alive.select(col("id").as("v")), Seq("v"), "left_semi")
      val deg = aliveEdges.groupBy(col("u").as("id"))
        .agg(count(lit(1)).as("__d"))
      // `withDeg` is consumed twice per round (peeled + survivors) and
      // `alive`/`trace` feed the NEXT round — without a landed boundary
      // every reference re-derives all prior rounds and the lineage cost
      // compounds geometrically (measured: 43 s → 2 s at sf0.1 with the
      // pin). The frames are node-id-sized, the [[graft.relational.Stages
      // .pin]] class; same discipline as the connected-components rounds.
      val withDeg = graft.relational.Stages.pin(
        alive.join(deg, Seq("id"), "left")
          .withColumn("__d", coalesce(col("__d"), lit(0L))))
      val peeled = withDeg.filter(col("__d") < k).select(col("id"))
      trace = graft.relational.Stages.pin(
        trace.join(peeled.withColumn("__p", lit(r.toLong)),
          Seq("id"), "left")
          .withColumn("peel_round",
            when(col("peel_round") === 0L && col("__p").isNotNull, col("__p"))
              .otherwise(col("peel_round")))
          .drop("__p"))
      alive = withDeg.filter(col("__d") >= k).select(col("id"))
    }
    val survivorEdges = sym
      .join(alive.select(col("id").as("u")), Seq("u"), "left_semi")
      .join(alive.select(col("id").as("v")), Seq("v"), "left_semi")
    val finalDeg = survivorEdges.groupBy(col("u").as("id"))
      .agg(count(lit(1)).as("final_degree"))
    trace.join(finalDeg, Seq("id"), "left")
      .withColumn("final_degree",
        when(col("peel_round") =!= 0L, lit(0L))
          .otherwise(coalesce(col("final_degree"), lit(0L))))
  }
}
