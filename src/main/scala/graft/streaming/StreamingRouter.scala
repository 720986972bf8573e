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

  /** Drain a BOUNDED stream through the routed path into a parquet sink and
    * block until done (`Trigger.AvailableNow`): the reference's whole job
    * shape — decode → validate → route → ack/quarantine per micro-batch,
    * every batch appended with its tag + reason columns so branches,
    * dead letters, and skips all land in one downstream-queryable dataset
    * (ref lib/kinesisHandler.js:132-192). Checkpointed offsets make a
    * restart resume instead of re-reading (at-least-once; the parquet
    * append is the idempotency boundary, exactly the reference's re-poll
    * contract).
    */
  def drainRoutedToParquet(stream: DataFrame, config: Router.Config,
                           keepCols: Seq[String], outDir: String,
                           checkpointDir: String,
                           filesPerBatch: Int = 1): Unit = {
    val q = foreachRoutedBatch(stream, config) { (routed, _) =>
      routed.tagged
        .select((Seq(Router.TagCol, Router.ReasonCol) ++ keepCols).map(col): _*)
        // micro-batch size is bounded by the source's batch config, so a
        // fixed small file count per batch is the correct sink layout —
        // without it every batch fans out to shuffle-partition-many tiny
        // files and downstream reads pay the listing
        .coalesce(filesPerBatch)
        .write.mode("append").parquet(outDir)
    }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
    awaitBounded(q)
  }

  /** Drain a bounded Append-mode stream into a parquet sink and return a
    * reader over the landed files. This is the ONLY scale-safe shape for a
    * streaming frame that is not answer-sized (raw routed rows, stream-stream
    * join pairs, per-event dedup survivors): the rows land on (distributed)
    * storage executor-to-disk and the driver never holds them — a memory
    * sink would collect the full pre-aggregation set into the driver
    * catalog, which dies at 100× gate scale. Downstream aggregation is then
    * ordinary batch SQL over the sink, the same pattern as
    * [[drainRoutedToParquet]].
    */
  def drainToParquet(df: DataFrame, tag: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_stream_$tag")
    val sinkDir = root.resolve("sink").toString
    val ckpt = root.resolve("ckpt").toString
    val q = df.writeStream.format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    awaitBounded(q)
    // the returned frame reads the sink lazily; only safe delete point is
    // JVM exit (deleteOnExit runs in reverse registration order, so the
    // top-down walk removes files before their dirs)
    java.nio.file.Files.walk(root).forEach(p => p.toFile.deleteOnExit())
    df.sparkSession.read.parquet(sinkDir)
  }

  /** Drain a bounded Complete-mode memory-sink query and hand back its final
    * result as a LOCAL relation, dropping the temp view. Only for
    * ANSWER-SIZED aggregates (windowed counts, per-key sessions): Complete
    * mode re-emits the whole result each trigger, so the sink table IS the
    * answer. Localizing + dropping the view keeps repeated runs in one
    * session (Verify, Bench warmups, PlanAudit) from pinning one abandoned
    * result set per run in the driver catalog for the session lifetime.
    */
  def drainMemoryToLocal(q: StreamingQuery, name: String): DataFrame = {
    awaitBounded(q)
    val spark = q.sparkSession
    val t = spark.table(name)
    val rows = java.util.Arrays.asList(t.collect(): _*)
    val local = spark.createDataFrame(rows, t.schema)
    spark.catalog.dropTempView(name)
    local
  }

  /** Await a bounded (AvailableNow) query with a hang guard: a wedged
    * stream inside a correctness-gate query must fail loudly, not hang the
    * whole gate run. Ten minutes is ~50× the worst observed drain.
    */
  def awaitBounded(q: StreamingQuery, timeoutMs: Long = 600000L): Unit =
    if (!q.awaitTermination(timeoutMs)) {
      q.stop()
      throw new IllegalStateException(
        s"bounded streaming query '${q.name}' still running after ${timeoutMs} ms")
    }
}
