package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (LPA, Raghavan 2007) over an undirected
  * graph — community detection on the kNN similarity graph, the finer-than-
  * connected-components structure signal (CC merges everything reachable;
  * LPA communities stop where neighborhoods stop agreeing). Used on corpora
  * to pick topical sampling strata and to spot near-dup neighborhoods that
  * fall short of the dedup threshold.
  *
  * Determinism is engineered (textbook LPA is randomized): updates are
  * SYNCHRONOUS over a FIXED round count, every node starts labeled with its
  * own id, each round every node adopts the most frequent label among its
  * neighbors with the (count desc, label asc) tiebreak, and isolated nodes
  * keep their label. Fixed rounds keep the whole run a finite chain of
  * joins/aggregations the oracle replays as chained CTEs (the
  * bpe_train_merges / knn_kcore precedent).
  *
  * Scale: per round one edge⋈label equi-join (degree-bounded fan-out on a
  * kNN graph), one (node, label) count, one bounded-heap top-1 per node
  * ([[graft.relational.TopK]] — no window over the corpus), one left join
  * back to nodes. Everything keyed on node id after the first exchange.
  */
object LabelProp {

  /** (id, community) after `rounds` synchronous LPA rounds. `nodes` holds
    * distinct ids; `edges` unordered pairs (one row each).
    */
  def communities(nodes: DataFrame, idCol: String,
                  edges: DataFrame, aCol: String, bCol: String,
                  rounds: Int): DataFrame = {
    require(rounds >= 1)
    val n0 = nodes.select(col(idCol).as("id"))
    val sym = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(edges.select(col(bCol).as("u"), col(aCol).as("v")))
    var labels = n0.withColumn("lab", col("id"))
    for (_ <- 1 to rounds) {
      val votes = sym
        .join(labels.select(col("id").as("u"), col("lab")), Seq("u"))
        .groupBy(col("v").as("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val best = graft.relational.TopK.perGroup(
        votes, Seq("id"), Seq(("c", false), ("lab", true)), 1)
        .select(col("id"), col("lab").as("__new"))
      // land each round: `labels` feeds the next round TWICE (vote join +
      // fallback coalesce), so unpinned lineage re-derives all prior
      // rounds geometrically (the k-core lesson, same node-id-sized class)
      labels = graft.relational.Stages.pin(
        labels.join(best, Seq("id"), "left")
          .select(col("id"), coalesce(col("__new"), col("lab")).as("lab")))
    }
    labels.select(col("id"), col("lab").as("community"))
  }
}
