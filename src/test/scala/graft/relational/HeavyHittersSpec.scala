package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: item i repeated 1000/i times, i = 1..50. */
  private def zipf = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item_$i"))

  test("exactHeavyHitters equals the naive full groupBy plan") {
    for (k <- Seq(5, 20, 100); parts <- Seq(1, 4, 13)) {
      val items = spark.sparkContext.parallelize(zipf, parts).toDF("item")
      val n = zipf.size.toLong
      val expected = zipf.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > n }.toMap
      val got = HeavyHitters.exactHeavyHitters(items, "item", k)
        .select("item", "cnt").as[(String, Long)].collect().toMap
      assert(got === expected, s"k=$k parts=$parts")
    }
  }

  test("candidates retain every item above the n/(k+1) guarantee line") {
    val items = spark.sparkContext.parallelize(zipf, 7).toDF("item")
    val n = zipf.size.toLong
    val k = 10
    val cand = HeavyHitters.candidates(items, "item", k)
      .as[String].collect().toSet
    zipf.groupBy(identity).foreach { case (item, occ) =>
      if (occ.size.toLong * (k + 1) > n)
        assert(cand.contains(item), s"$item (${occ.size}) must survive MG")
    }
  }

  test("verify join dispatches broadcast vs shuffle on the candidate bound") {
    val items = spark.sparkContext.parallelize(zipf, 4).toDF("item")
    val n = zipf.size.toLong
    val k = 5
    val expected = zipf.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap

    def planOf(limit: Long) = {
      val df = HeavyHitters.exactHeavyHitters(items, "item", k, limit)
      val got = df.select("item", "cnt").as[(String, Long)].collect().toMap
      assert(got === expected, s"limit=$limit changed the answer")
      df.queryExecution.executedPlan.toString
    }
    // bound = k·parts = 20: default limit → broadcast branch
    val bPlan = planOf(2000000L)
    assert(bPlan.contains("BroadcastHashJoin"),
      "small candidate bound must broadcast the verify probe")
    // limit below the bound → shuffle-hash branch, no broadcast of candidates
    val sPlan = planOf(10L)
    assert(sPlan.contains("ShuffledHashJoin"),
      "over-limit candidate bound must fall back to a shuffle hash join")
  }

  test("n_total is the full stream length, not the candidate subset") {
    val items = spark.sparkContext.parallelize(zipf, 3).toDF("item")
    val rows = HeavyHitters.exactHeavyHitters(items, "item", 5).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_total") === zipf.size.toLong))
  }
}
