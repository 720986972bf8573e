package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Partition-quality metrics over an undirected graph — the acceptance
  * check for any community structure the engine produces (LPA labels,
  * connected components, IVF cells used as clusters): Newman modularity
  * Q = Σ_c [e_c/m − (d_c/2m)²], the standard "is this clustering better
  * than chance" score community detection is tuned against.
  *
  * Exactness: everything reduces to integer counts (m, per-community
  * internal edges e_c, degree sums d_c); Q is emitted as the exact
  * micro-scaled rational 10⁶·Σ(4m·e_c − d_c²) div (4m²) in DECIMAL(38,0)
  * (4m² passes 2⁶³ near m ≈ 1.5e9 edges), with truncating division —
  * engine-identical, negatives included (a worse-than-chance partition is
  * a legitimate verdict).
  *
  * Scale: one degree aggregation, two keyed label joins (edges are
  * degree-bounded for kNN graphs), community-sized rollups, and 1-row
  * total broadcasts — no windows, no pair work beyond the edge list
  * itself.
  */
object GraphMetrics {

  /** Per-community modularity ledger: (community, n_nodes, internal_edges,
    * degree_sum, q_contrib_micro) plus the global `modularity_micro`
    * repeated on every row (the exact total, computed from untruncated
    * terms — NOT the sum of the per-row truncated contributions).
    */
  def modularity(labels: DataFrame, idCol: String, commCol: String,
                 und: DataFrame, aCol: String, bCol: String): DataFrame = {
    val lab = labels.select(col(idCol).as("id"), col(commCol).as("community"))
    val edges = und.select(col(aCol).as("a"), col(bCol).as("b"))
    val deg = edges.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val dc = lab.join(deg, Seq("id"), "left")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("d"), lit(0L))).cast(DecimalType(38, 0)).as("d_c"))
    val ec = edges
      .join(lab.select(col("id").as("a"), col("community").as("ca")), "a")
      .join(lab.select(col("id").as("b"), col("community").as("cb")), "b")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_c"))
    val m = broadcast(edges.agg(count(lit(1)).cast(DecimalType(38, 0)).as("m")))
    // the per-community term frame is answer-sized and read twice (total +
    // final projection) — pinned so the label/edge joins don't re-derive
    val per = graft.relational.Stages.pin(
      dc.join(ec, Seq("community"), "left").crossJoin(m)
        .withColumn("e_c", coalesce(col("e_c"), lit(0L)))
        .withColumn("__term", expr("4 * m * e_c - d_c * d_c")))
    val tot = broadcast(per.agg(sum(col("__term")).as("__num"),
      max(col("m")).as("__m")))
    per.crossJoin(tot)
      .select(col("community"), col("n_nodes"),
        col("e_c").cast("long").as("internal_edges"),
        col("d_c").cast("long").as("degree_sum"),
        expr("(1000000 * __term) div (4 * m * m)").as("q_contrib_micro"),
        expr("(1000000 * __num) div (4 * __m * __m)").as("modularity_micro"))
  }
}
