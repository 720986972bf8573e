package graft.streaming

import graft.SparkSpec
import graft.relational.HeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Misra–Gries heavy-hitter candidates merge across micro-batches the same
  * way they merge across partitions: the pigeonhole argument cares only that
  * the stream is SPLIT, not how. If an item's global frequency exceeds
  * n/(k+1) over everything streamed so far, some batch has it above its
  * local budget, so the union of per-batch candidate sets retains it. The
  * batch operator therefore runs unchanged inside foreachBatch — candidates
  * accumulate (bounded by k per batch), and the exact verify over the
  * archived stream turns them into the exact heavy-hitter set at read time.
  */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch MG candidates accumulate to a superset; verify stays exact") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val k = 8
    var candidates = Set.empty[String]
    var archive = Seq.empty[String]

    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        archive ++= batch.as[String].collect()
        candidates ++= HeavyHitters.candidates(
          batch.withColumnRenamed("value", "item"), "item", k)
          .as[String].collect()
      }.start()
    try {
      // batch 1: "hot" dominates; batch 2: "warm" surges late
      input.addData(Seq.fill(60)("hot") ++ (1 to 30).map(i => s"noise$i"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(50)("warm") ++ Seq.fill(20)("hot") ++
        (31 to 50).map(i => s"noise$i"): _*)
      q.processAllAvailable()

      val n = archive.size.toLong
      val exact = archive.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // guarantee: everything over n/(k+1) survived in some batch's sketch
      exact.foreach { case (item, c) =>
        if (c * (k + 1) > n)
          assert(candidates.contains(item), s"$item ($c of $n) must be retained")
      }
      // read-time exact verify over the archive equals the naive answer
      val verified = HeavyHitters.exactHeavyHitters(
        archive.toDF("item"), "item", k)
        .select("item", "cnt").as[(String, Long)].collect().toMap
      val naive = exact.filter { case (_, c) => c * k > n }
      assert(verified === naive)
      assert(verified.keySet === Set("hot", "warm"))
    } finally q.stop()
  }
}
