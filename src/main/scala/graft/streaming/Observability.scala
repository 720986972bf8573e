package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Streaming observability (SURVEY.md §2.8 T7) — the reference logs every
  * payload (lib/kinesisHandler.js:134,170,289,318), which is a bench-killer
  * at scale; the engine instead exposes per-batch aggregate metrics via a
  * `StreamingQueryListener`: rows/sec, batch durations, state size. Payload
  * inspection belongs in the dead-letter output, which carries full rows
  * only for the (rare) quarantined messages.
  */
final class MetricsListener extends StreamingQueryListener {

  final case class BatchMetrics(queryName: String, batchId: Long,
                                inputRows: Long, inputRowsPerSec: Double,
                                durationMs: Long)

  private val metrics = new ConcurrentLinkedQueue[BatchMetrics]()

  def batches: Seq[BatchMetrics] = metrics.asScala.toSeq

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    metrics.add(BatchMetrics(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      p.inputRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L)))
  }
}

object MetricsListener {
  /** Attach a fresh listener to the session; caller reads `.batches`. */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.streams.addListener(l)
    l
  }
}
