package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DataSource V2 micro-batch source that REPLAYS a bounded dataset (e.g. the
  * events fixture) as a stream of fixed-size micro-batches — the test/backfill
  * stand-in for the production Kinesis source (SURVEY.md §2.1 S1: one Lambda
  * invoke = one batch ⇒ one trigger = one batch here).
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft.sources.ReplayStreamSource")
  *     .option("path", "/data/events.parquet")
  *     .option("batchSize", "250")
  *     .load()
  * }}}
  *
  * Semantics: offsets are row indices into a deterministic snapshot taken at
  * stream start; each trigger advances by `batchSize` rows, so a bounded
  * input produces ⌈n/batchSize⌉ micro-batches and then idles. Offsets are
  * replayable (restart from checkpoint re-serves the same rows) — the
  * at-least-once contract of the reference. Like Spark's own MemoryStream,
  * the snapshot lives in driver memory: this source is for tests and
  * harnesses, not production volumes.
  */
class ReplayStreamSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SparkSession.active.read.parquet(options.get("path")).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ReplayTable(properties.get("path"),
      Option(properties.get("batchSize")).map(_.toInt).getOrElse(1000), schema)
}

final class ReplayTable(path: String, batchSize: Int, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"replay($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ReplayMicroBatchStream(path, batchSize, tableSchema)
      }
    }
}

final case class ReplayOffset(rows: Long) extends Offset {
  override def json(): String = rows.toString
}

final class ReplayMicroBatchStream(path: String, batchSize: Int, schema: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // deterministic snapshot at stream start (driver-held, MemoryStream-style)
  private lazy val snapshot: Array[InternalRow] = {
    val df = SparkSession.active.read.schema(schema).parquet(path)
    df.queryExecution.toRdd.map(_.copy()).collect()
  }

  override def initialOffset(): Offset = ReplayOffset(0L)

  // Admission control: each trigger admits at most `batchSize` rows; the
  // AvailableNow wrapper then iterates triggers until reportLatestOffset.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ReplayOffset].rows
    val max = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => batchSize.toLong
    }
    ReplayOffset(math.min(s + max, snapshot.length.toLong))
  }

  override def reportLatestOffset(): Offset = ReplayOffset(snapshot.length.toLong)

  override def prepareForTriggerAvailableNow(): Unit = ()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")

  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ReplayOffset].rows.toInt
    val hi = end.asInstanceOf[ReplayOffset].rows.toInt
    val slice = snapshot.slice(lo, hi)
    // split the batch across tasks like a real partitioned source would
    val nSplits = math.max(1, math.min(4, slice.length))
    slice.grouped(math.max(1, math.ceil(slice.length.toDouble / nSplits).toInt))
      .map(rows => ReplayInputPartition(rows): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val rows = partition.asInstanceOf[ReplayInputPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class ReplayInputPartition(rows: Array[InternalRow]) extends InputPartition
