package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the serving-side diversity pass: from each query's retrieved candidate
  * pool, greedily select items trading relevance against similarity to
  * what is already selected, mmr = (score − max-sim-to-selected) / 2
  * (λ = 1/2 carried as one subtraction and one halving so both engines
  * evaluate the identical IEEE expression). The first pick is pure
  * relevance; ties break toward the smaller candidate id, so every round
  * is deterministic and the oracle replays the greedy round for round.
  *
  * Scale: the pool is ALREADY answer-sized (queries × k rows from the
  * retrieval stage), so the pairwise-sim frame is queries·k² rows and
  * each of the `select` rounds is a keyed max + one windowed argmax over
  * answer-sized frames — the expensive work stays in the retrieval stage
  * where it belongs.
  */
object Mmr {

  /** Re-rank `pool` (qid, cid, score) using vectors from `vecs`
    * (idCol, vecCol); returns (qid, mmr_rank, cid, score), one row per
    * selected item, `select` per query. */
  def rerank(pool: DataFrame, vecs: DataFrame, idCol: String, vecCol: String,
             select: Int, maxPoolRows: Long = 1000000L): DataFrame = {
    require(select >= 1 && select <= 64,
      s"mmr: select=$select outside 1..64")
    // the pool must be the answer-sized RETRIEVAL OUTPUT (queries × k) —
    // a corpus-sized pool would square in the sims frame; fail loudly
    val poolN = pool.limit((maxPoolRows + 1).toInt).count()
    require(poolN <= maxPoolRows,
      s"mmr: pool has > $maxPoolRows rows — rerank the retrieval top-k, " +
        "not the corpus")
    val pv = pool.join(
      vecs.select(col(idCol).as("cid"), col(vecCol).as("__cv")), Seq("cid"))
    val sims = graft.relational.Stages.materialize(
      pv.select(col("qid"), col("cid").as("c1"), col("__cv").as("__v1"))
        .join(pv.select(col("qid"), col("cid").as("c2"), col("__cv").as("__v2")),
          Seq("qid"))
        .filter(col("c1") =!= col("c2"))
        .select(col("qid"), col("c1"), col("c2"),
          VectorFunctions.cosine(col("__v1"), col("__v2")).as("sim")),
      "mmr_sims")
    val wPick = Window.partitionBy(col("qid"))
      .orderBy(desc("__mmr"), col("cid"))
    var selected = pool
      .withColumn("__mmr", col("score"))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .select(col("qid"), lit(1L).as("mmr_rank"), col("cid"), col("score"))
    for (r <- 2 to select) {
      val ms = sims
        .join(selected.select(col("qid"), col("cid").as("c2")), Seq("qid", "c2"))
        .groupBy(col("qid"), col("c1").as("cid"))
        .agg(max(col("sim")).as("__ms"))
      val pick = pool
        .join(selected.select(col("qid"), col("cid")), Seq("qid", "cid"),
          "left_anti")
        .join(ms, Seq("qid", "cid"))
        .withColumn("__mmr", (col("score") - col("__ms")) / 2)
        .withColumn("__rn", row_number().over(wPick))
        .filter(col("__rn") === 1)
        .select(col("qid"), lit(r.toLong).as("mmr_rank"), col("cid"),
          col("score"))
      selected = graft.relational.Stages.pin(selected.unionByName(pick))
    }
    selected.orderBy(col("qid"), col("mmr_rank"))
  }
}
