package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming first-occurrence dedup suppresses duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    val deduped = StatefulOps.firstOccurrences(input.toDS())(_._1)

    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(("a", 1), ("b", 2), ("a", 3)) // a duplicated within batch
    q.processAllAvailable()
    input.addData(("a", 4), ("c", 5))           // a duplicated across batches
    q.processAllAvailable()
    val got = spark.table("dedup_out").as[(String, Int)].collect().toSet
    q.stop()

    assert(got.map(_._1) === Set("a", "b", "c"))
    assert(got.count(_._1 == "a") === 1, "only first occurrence of 'a' survives")
  }

  test("deterministic first occurrence keeps the better-min row per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    val kept = StatefulOps.firstOccurrenceBy(input.toDS())(
      _._1, (a, b) => if (a._2 <= b._2) a else b)

    val q = kept.writeStream.format("memory").queryName("first_by_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(("a", 7), ("a", 3), ("b", 9)) // in-batch reduce picks a->3
    q.processAllAvailable()
    input.addData(("a", 1), ("b", 2), ("c", 5)) // later batches never re-emit
    q.processAllAvailable()
    val got = spark.table("first_by_out").as[(String, Int)].collect().toSet
    q.stop()

    assert(got === Set(("a", 3), ("b", 9), ("c", 5)),
      "winner is the in-batch minimum of the FIRST batch carrying the key")
  }


  test("streaming CUSUM matches the batch closed form across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    // per-batch counts for key "a": 5, 5, 20 with allowance 12 →
    // d = (-7, -7, 8), P = (-7, -14, -6), S = P − min(0, runmin P) =
    // (0, 0, 8) — the ChangepointSpec recurrence, per trigger.
    val out = StatefulOps.cusumPerBatch(input.toDS(), 12L)(identity)

    val q = out.writeStream.format("memory").queryName("cusum_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(Seq.fill(5)("a"): _*); q.processAllAvailable()
    input.addData(Seq.fill(5)("a"): _*); q.processAllAvailable()
    input.addData(Seq.fill(20)("a"): _*); q.processAllAvailable()
    val got = spark.table("cusum_out").as[(String, Long, Long, Long)]
      .collect().sortBy(_._2).toSeq
    q.stop()

    assert(got === Seq(("a", 1L, 5L, 0L), ("a", 2L, 5L, 0L),
      ("a", 3L, 20L, 8L)))
  }

  test("running counts accumulate state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    val counts = StatefulOps.runningCounts(input.toDS())(_._1)

    val q = counts.writeStream.format("memory").queryName("counts_out")
      .outputMode(OutputMode.Update()).start()

    input.addData(("u1", 1), ("u1", 2), ("u2", 3))
    q.processAllAvailable()
    input.addData(("u1", 4))
    q.processAllAvailable()
    // Update mode: latest row per key wins
    val got = spark.table("counts_out").as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    q.stop()

    assert(got === Map("u1" -> 3L, "u2" -> 1L))
  }
}
