package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup: cluster-bounded semantic dedup with the paper's
  * keep-the-centroid-outlier rule. Synthetic vectors with planted duplicate
  * groups pin down every stage; the sf0.001 run locks the invariants on
  * real data.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two far-apart clusters in 4-d; within cluster A a triangle of
  // near-duplicates (ids 0,1,2) plus an outlier-ish singleton (id 3);
  // cluster B holds a duplicate pair (ids 10,11) and a singleton (12).
  private def synth = Seq(
    (0L, Seq(1.00, 0.00, 0.0, 0.0)),
    (1L, Seq(0.99, 0.10, 0.0, 0.0)),
    (2L, Seq(0.98, 0.15, 0.0, 0.0)),
    (3L, Seq(0.60, -0.80, 0.0, 0.0)),
    (10L, Seq(0.0, 0.0, 1.00, 0.00)),
    (11L, Seq(0.0, 0.0, 0.99, 0.05)),
    (12L, Seq(0.0, 0.0, 0.50, 0.86))
  ).toDF("id", "vec")

  // Seeds chosen as the cluster axes so assignment is unambiguous.
  private val seeds: Seq[(Long, Seq[Double])] =
    Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 0.0, 1.0, 0.0)))

  private lazy val verdict = SemDedup.semanticDedup(
    synth, "id", "vec", nlist = 2, threshold = 0.9,
    trainedSeeds = Some(seeds)).cache()

  test("duplicate groups form only within cells and close transitively") {
    val byComp = verdict.groupBy("comp").agg(collect_list("id").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.sorted).toMap
    // 0~1, 1~2 chain into one group even if 0~2 alone is borderline
    assert(byComp(0L) === Seq(0L, 1L, 2L))
    assert(byComp(10L) === Seq(10L, 11L))
    assert(byComp(3L) === Seq(3L))
    assert(byComp(12L) === Seq(12L))
  }

  test("exactly one keep per group; singletons always kept") {
    val keeps = verdict.groupBy("comp").agg(sum("keep").as("k"))
      .as[(Long, Long)].collect()
    assert(keeps.forall(_._2 === 1L))
  }

  test("keep rule retains the member least similar to its centroid") {
    val a = verdict.filter(col("comp") === 0L)
      .select("id", "csim", "keep").as[(Long, Double, Long)].collect()
    val kept = a.filter(_._3 === 1L)
    assert(kept.length === 1)
    // id 2 points farthest from the (1,0,0,0) centroid within the group
    assert(kept.head._1 === 2L)
    assert(kept.head._2 === a.map(_._2).min)
  }

  test("cells come from the argmax assignment with sid tie-break") {
    val cells = verdict.select("id", "cell").as[(Long, Long)].collect().toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(cells(_) === 0L))
    assert(Seq(10L, 11L, 12L).forall(cells(_) === 1L))
  }

  test("real embeddings: verdict covers every doc, keeps dominate") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val v = SemDedup.semanticDedup(emb, "vec_id", "embedding",
      nlist = 8, threshold = 0.4)
    val n = emb.count()
    assert(v.count() === n)
    val kept = v.filter(col("keep") === 1L).count()
    assert(kept > 0 && kept <= n)
    // every group keeps exactly one
    assert(v.groupBy("comp").agg(sum("keep").as("k"))
      .filter(col("k") =!= 1L).count() === 0L)
  }
}
