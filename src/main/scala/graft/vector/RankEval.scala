package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NDCG ranking-quality audit of an approximate retrieval ranking against
  * the exact ranking (Järvelin & Kekäläinen 2002) — the companion to the
  * recall audits (O74/O93): recall asks "did the right items come back",
  * NDCG asks "did they come back in the right ORDER, near the top". An ANN
  * index that returns all ten exact hits reversed scores 1000‰ recall but
  * materially lower NDCG — exactly the serving regression recall cannot
  * see.
  *
  * Exactness: graded relevance is the exact-rank reflection rel =
  * (k+1) − exact_rank (top exact hit = k, miss = 0 — integer, no float
  * gain table), and the position discount is the house integer-bits
  * surrogate for 1/log₂(pos+1): 10⁶ div (length(bin(pos+1)) − 1) — the
  * [[graft.dedup.GraphMetrics]] Adamic–Adar discipline, identical
  * arithmetic in DuckDB. DCG/IDCG are exact-long sums of those products;
  * NDCG is one truncating permille divide. IDCG comes from the SAME
  * expression over the exact ranking, so the audit is self-normalizing
  * per query.
  *
  * Scale: two answer-sized joins — both inputs are top-k frames (k rows
  * per query), so everything after the retrieval calls is bounded by
  * queries × k however large the corpus. The expensive parts are the
  * retrieval calls the caller makes, whose scale paths are the gated
  * LSH/IVF/PQ rows.
  */
object RankEval {

  /** Per-query frame (qid, n_hits, dcg_micro, idcg_micro, ndcg_permille),
    * qid order. `exact` and `approx` both carry (qid, cid, rank) with
    * rank 1-based; `exact` must be a FULL top-k per query (it defines the
    * ideal ordering), `approx` may return fewer — missing positions simply
    * contribute no gain.
    */
  def ndcg(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"ndcg: k=$k outside 1..1000")
    val ex = exact.select(col("qid"), col("cid"), col("rank").as("__xr"))
    val ap = approx.select(col("qid"), col("cid"), col("rank").as("__ar"))
    val gains = ap.join(ex, Seq("qid", "cid"), "left")
      .select(col("qid"),
        coalesce(lit(k + 1).cast("long") - col("__xr"), lit(0L)).as("__rel"),
        col("__ar"))
      .groupBy(col("qid"))
      .agg(
        sum(when(col("__rel") > 0, 1L).otherwise(0L)).as("n_hits"),
        sum(col("__rel") *
          expr("1000000L div (length(bin(__ar + 1L)) - 1)")).as("dcg_micro"))
    val ideal = ex.groupBy(col("qid"))
      .agg(sum((lit(k + 1).cast("long") - col("__xr")) *
        expr("1000000L div (length(bin(__xr + 1L)) - 1)")).as("idcg_micro"))
    gains.join(ideal, Seq("qid"))
      .select(col("qid"), col("n_hits"), col("dcg_micro"), col("idcg_micro"),
        expr("(1000L * dcg_micro) div idcg_micro").as("ndcg_permille"))
      .orderBy(col("qid"))
  }
}
