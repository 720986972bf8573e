package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed modularity of two bridged triangles") {
    // triangles {1,2,3} and {4,5,6} bridged by (3,4): m = 7,
    // d_A = d_B = 7, e_A = e_B = 3 → term = 4·7·3 − 49 = 35 per side,
    // Q = 2·[3/7 − (7/14)²] = 5/14 → 357142 micro (truncated);
    // per-community contribution 10⁶·35 div 196 = 178571
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "community")
    val out = GraphMetrics.modularity(labels, "id", "community", und, "a", "b")
      .select("community", "n_nodes", "internal_edges", "degree_sum",
        "q_contrib_micro", "modularity_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 3L, 3L, 7L, 178571L, 357142L),
      (4L, 3L, 3L, 7L, 178571L, 357142L)))
  }

  test("link prediction: hand-computed CN/AA, edges excluded, topK honored") {
    // square 1-2-3-4 plus pendant triangle edges (1,5),(3,5):
    // degrees 1:3, 2:2, 3:3, 4:2, 5:2. Non-edge pairs:
    //   (1,3): z ∈ {2,4,5}, all d=2 → bits=1 → cn=3, aa=3·10⁶
    //   (2,4)/(2,5)/(4,5): z ∈ {1,3} (d=3 → bits=1) → cn=2, aa=2·10⁶
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L), (3L, 5L))
      .toDF("a", "b")
    val top = GraphMetrics.linkPrediction(und, "a", "b", topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(top === Seq((1L, 3L, 3L, 3000000L), (2L, 4L, 2L, 2000000L),
      (2L, 5L, 2L, 2000000L)))
    val all = GraphMetrics.linkPrediction(und, "a", "b", topK = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(all.size === 4 && all.last === ((4L, 5L, 2L, 2000000L)))
  }

  test("link prediction AA weight halves through a degree-4 hub; edges never surface") {
    // star: hub 10 — {1,2,3,4}, plus edge (1,2). d_hub=4 → bits=2 →
    // each wedge through the hub contributes 500000; the (1,2) pair has a
    // common neighbor but IS an edge, so it must not appear.
    val und = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (1L, 2L))
      .toDF("a", "b")
    val out = GraphMetrics.linkPrediction(und, "a", "b", topK = 20)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L, 1L, 500000L), (1L, 4L, 1L, 500000L),
      (2L, 3L, 1L, 500000L), (2L, 4L, 1L, 500000L), (3L, 4L, 1L, 500000L)))
  }

  test("single-community partition scores zero; worse-than-chance goes negative") {
    val und = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    // everything in one community: e = m, d = 2m → Q = 1 − 1 = 0
    val one = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L)).toDF("id", "community")
    assert(GraphMetrics.modularity(one, "id", "community", und, "a", "b")
      .select("modularity_micro").as[Long].head() === 0L)
    // anti-partition: both edges CROSS communities → e_c = 0, Q < 0
    val anti = Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L)).toDF("id", "community")
    val q = GraphMetrics.modularity(anti, "id", "community", und, "a", "b")
      .select("modularity_micro").as[Long].head()
    assert(q < 0L)
  }
}
