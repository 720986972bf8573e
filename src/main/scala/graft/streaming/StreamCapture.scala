package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Audit hook for per-trigger streaming plan capture (dev-tool support for
  * `graft.PlanAudit`; a normal run never enables it and never registers a
  * listener).
  *
  * Why it exists: Structured Streaming's per-trigger `IncrementalExecution`s
  * are not delivered through `QueryExecutionListener`, so PlanAudit's aux-job
  * scan gate was blind to anything inside a micro-batch (the r12 verdict's
  * blind spot). And the engine's streaming drains run on `newSession()`
  * CLONES (`Dsl.streamSession` right-sizes state-store partitioning without
  * mutating the caller's conf) — each clone has its OWN
  * `StreamingQueryManager`, so a listener registered on the audit's root
  * session never sees the clone's queries. The clone factory therefore
  * attaches this capture to every clone it creates while capture is enabled;
  * `onQueryStarted` is delivered synchronously with the starting thread, so
  * a bounded drain is always captured before the declared query returns.
  */
object StreamCapture {

  @volatile private var on = false
  private val startCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private val queries = java.util.Collections.synchronizedList(
    new java.util.ArrayList[StreamingQuery]())
  // per-trigger progress events (r16): the phase decomposition StreamProbe's
  // "phases" mode prints — durationMs + state-operator metrics per trigger
  private val progresses = java.util.Collections.synchronizedList(
    new java.util.ArrayList[org.apache.spark.sql.streaming.StreamingQueryProgress]())

  def enabled: Boolean = on
  def enable(): Unit = { on = true }

  /** Clear the per-declared-query window. */
  def reset(): Unit = { startCount.set(0); queries.clear(); progresses.clear() }

  def progressSnapshot: List[org.apache.spark.sql.streaming.StreamingQueryProgress] =
    progresses.synchronized {
      scala.jdk.CollectionConverters.ListHasAsScala(progresses).asScala.toList }

  /** (queries started since reset, queries captured since reset) — a
    * mismatch means a started query escaped capture and its triggers went
    * ungated; the caller must refuse loudly.
    */
  def snapshot: (Int, List[StreamingQuery]) = {
    val qs = queries.synchronized {
      scala.jdk.CollectionConverters.ListHasAsScala(queries).asScala.toList }
    (startCount.get, qs)
  }

  /** Register the capture listener on `ss`'s own query manager. Also
    * raises the session's metadata string length: scan counting parses
    * `Location:` path lists out of the trigger plan, and the default 100
    * truncates them (the same belt PlanAudit wears on its root session;
    * the locbad cross-check refuses if truncation ever slips through).
    */
  def attach(ss: SparkSession): Unit = {
    ss.conf.set("spark.sql.maxMetadataStringLength", "65536")
    ss.streams.addListener(new StreamingQueryListener {
      import StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = if (on) {
        startCount.incrementAndGet()
        val q = ss.streams.get(e.id)
        if (q != null) queries.add(q)
      }
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (on) { progresses.add(e.progress); () }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
  }
}
