package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery}
import org.apache.spark.sql.Row
import graft.routing.Router

/** Structured-Streaming skin over the batch routing kernel.
  *
  * The reference's execution unit is "one Lambda invoke = one Kinesis batch"
  * (reference: lib/kinesisHandler.js:132-192); Structured Streaming's
  * micro-batch + `foreachBatch` is the exact same contract, so the batch
  * [[Router]] is reused unchanged — identical semantics in both modes by
  * construction, and the at-least-once + quarantine behavior carries over
  * (checkpointed offsets give the re-poll; bad messages land in the
  * dead-letter branch instead of failing the batch, ref :145-149).
  */
object StreamingRouter {

  /** Route each micro-batch through the batch kernel. The caller's `sink`
    * sees the same [[Router.Routed]] views a batch job gets.
    */
  def foreachRoutedBatch(stream: DataFrame, config: Router.Config)(
      sink: (Router.Routed, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(Router.route(batch, config), id)
    }

  /** Event-time tumbling/sliding counts with a watermark — late rows beyond
    * the watermark are dropped, state is bounded (mandated surface T6).
    */
  def windowedCounts(stream: DataFrame, tsCol: String, watermark: String,
                     size: String, slide: String, keyCols: String*): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), size, slide) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))

  /** Session windows by inactivity gap (event-time sessionization). */
  def sessionCounts(stream: DataFrame, tsCol: String, watermark: String,
                    gap: String, keyCols: String*): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))

  /** Start a memory-sink query for tests/smoke (synchronous drain via
    * `processAllAvailable`).
    */
  def startMemorySink(df: DataFrame, name: String, outputMode: OutputMode): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode).start()
}
