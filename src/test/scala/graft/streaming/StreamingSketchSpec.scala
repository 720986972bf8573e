package graft.streaming

import graft.SparkSpec
import graft.relational.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The Count-Min sketch's cells merge by addition — which is exactly what a
  * streaming aggregation's state update does. So the BATCH operator runs
  * unchanged as a streaming query: `countMinSketch` over a stream is a
  * stateful groupBy whose state IS the sketch (depth×width cells, bounded
  * forever), and any batch consumer (`countMinEstimate`) reads the result.
  * No separate streaming implementation to maintain or to drift.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("count-min over a stream: cells are agg state; estimates stay one-sided across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val sketch = Sketches.countMinSketch(input.toDF().withColumnRenamed("value", "k"),
      "k", depth = 3, width = 32)

    val q = sketch.writeStream.format("memory").queryName("cm_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((1L to 100L).map(_ % 10): _*) // 10 keys x 10
      q.processAllAvailable()
      input.addData((1L to 50L).map(_ % 5): _*)   // keys 0-4 get +10
      q.processAllAvailable()

      val sk = spark.table("cm_stream")
      // state never exceeds depth x width cells no matter how much streamed
      assert(sk.count() <= 3 * 32)
      val est = Sketches.countMinEstimate(sk, (0L until 10L).toDF("k"), "k",
        depth = 3, width = 32).as[(Long, Long)].collect().toMap
      val exact = ((1L to 100L).map(_ % 10) ++ (1L to 50L).map(_ % 5))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"key $k: est ${est(k)} < exact $n after 2 batches")
      }
    } finally q.stop()
  }
}
