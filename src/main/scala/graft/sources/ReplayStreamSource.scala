package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 micro-batch source that REPLAYS a bounded parquet dataset
  * (e.g. the events fixture) as a stream of fixed-size micro-batches — the
  * test/backfill stand-in for the production Kinesis source (SURVEY.md §2.1
  * S1: one Lambda invoke = one batch ⇒ one trigger = one batch here).
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
  * Semantics: offsets are row indices into a deterministic snapshot — the
  * parquet files under `path` sorted by name, rows in file order. Each
  * trigger advances by `batchSize` rows, so a bounded input produces
  * ⌈n/batchSize⌉ micro-batches and then idles. Offsets are replayable
  * (restart from checkpoint re-serves the same rows) — the at-least-once
  * contract of the reference. Alternatively `numBatches` fixes the batch
  * COUNT (batch size becomes ⌈n/numBatches⌉): use it when the multi-batch
  * SEMANTICS matter but the input size varies by scale factor, so drain
  * cost doesn't grow with per-batch bookkeeping.
  *
  * Scale shape: the driver reads ONLY parquet footers (file list + per-file
  * row counts — no data rows); `planInputPartitions` maps an offset range to
  * per-file row ranges, and each partition reader opens its file ON THE
  * EXECUTOR, skipping whole row groups that precede its range. Driver memory
  * is O(#files), not O(rows), so the source survives inputs that never fit
  * on the driver.
  */
class ReplayStreamSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SparkSession.active.read.parquet(options.get("path")).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ReplayTable(properties.get("path"),
      Option(properties.get("batchSize")).map(_.toInt).getOrElse(1000),
      Option(properties.get("numBatches")).map(_.toInt), schema)
}

final class ReplayTable(path: String, batchSize: Int, numBatches: Option[Int],
                        tableSchema: StructType)
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
          new ReplayMicroBatchStream(path, batchSize, numBatches, tableSchema)
      }
    }
}

final case class ReplayOffset(rows: Long) extends Offset {
  override def json(): String = rows.toString
}

/** One file of the snapshot: global row offset of its first row + row count. */
private[sources] final case class ReplayFile(path: String, start: Long, rows: Long)

final class ReplayMicroBatchStream(path: String, batchSize: Int,
                                   numBatches: Option[Int], schema: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Deterministic snapshot at stream start: parquet files sorted by name,
  // row counts from footers only — no data reaches the driver.
  private lazy val files: Array[ReplayFile] = {
    val conf = new Configuration()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val statuses =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.toString)
      else Array(fs.getFileStatus(root))
    var off = 0L
    statuses.map { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      val n = try reader.getRecordCount finally reader.close()
      val f = ReplayFile(st.getPath.toString, off, n)
      off += n
      f
    }
  }
  private lazy val totalRows: Long = files.map(_.rows).sum

  // `numBatches` overrides `batchSize` with ⌈total/numBatches⌉, holding the
  // micro-batch COUNT constant as the input grows — trigger overhead (offset
  // log writes, state commits, sink epochs) is per-batch, so a fixed-rows
  // batch size turns a 10× bigger replay into 10× the batches of pure
  // bookkeeping. Results are batching-invariant; only the drain cost isn't.
  private lazy val effectiveBatchRows: Long =
    numBatches.map(n => math.max(1L, (totalRows + n - 1) / n))
      .getOrElse(batchSize.toLong)

  override def initialOffset(): Offset = ReplayOffset(0L)

  // Admission control: each trigger admits at most `effectiveBatchRows`
  // rows; the AvailableNow wrapper then iterates triggers until
  // reportLatestOffset.
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(effectiveBatchRows)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ReplayOffset].rows
    val max = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => effectiveBatchRows
    }
    ReplayOffset(math.min(s + max, totalRows))
  }

  override def reportLatestOffset(): Offset = ReplayOffset(totalRows)

  override def prepareForTriggerAvailableNow(): Unit = ()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")

  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ReplayOffset].rows
    val hi = end.asInstanceOf[ReplayOffset].rows
    files.iterator.flatMap { f =>
      val s = math.max(lo, f.start)
      val e = math.min(hi, f.start + f.rows)
      if (s >= e) Iterator.empty
      else {
        // split a file range across tasks like a real partitioned source
        val take = e - s
        val nSplits = math.max(1L, math.min(4L, take))
        val chunk = math.max(1L, (take + nSplits - 1) / nSplits)
        (s until e by chunk).iterator.map { cs =>
          ReplayInputPartition(f.path, cs - f.start,
            math.min(chunk, e - cs), schema): InputPartition
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new ReplayPartitionReader(partition.asInstanceOf[ReplayInputPartition])

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** `skip`/`take` are row positions WITHIN the file. */
final case class ReplayInputPartition(path: String, skip: Long, take: Long,
                                      schema: StructType) extends InputPartition

/** Executor-side parquet reader: opens the file locally, skips whole row
  * groups preceding `skip` (footer metadata — no decode), then decodes
  * records via the parquet-hadoop example Group API and converts to
  * InternalRow by the Spark schema. Supports the flat primitive schemas this
  * source replays (long/int/double/float/boolean/string/binary/date,
  * timestamps surfaced as their physical int64).
  */
final class ReplayPartitionReader(p: ReplayInputPartition)
    extends PartitionReader[InternalRow] {

  private val reader =
    ParquetFileReader.open(HadoopInputFile.fromPath(new Path(p.path), new Configuration()))
  // post-open initialization closes the file handle on failure (e.g. a
  // mixed-schema directory where this file lacks a query column) — task
  // retries must not leak open streams
  private val (fileSchema, columnIO, fieldIdx, tsScale) =
    try {
      val fs = reader.getFooter.getFileMetaData.getSchema
      val io = new ColumnIOFactory().getColumnIO(fs)
      // parquet field index for each Spark field (by name — file order may differ)
      val idx = p.schema.fields.map(f => fs.getFieldIndex(f.name))
      // Spark timestamps are internally MICROSECONDS; the file's int64 may be
      // annotated millis/micros/nanos — precompute the per-field scale
      // (positive = multiply, negative = divide).
      val scale: Array[Long] = p.schema.fields.map { f =>
        f.dataType match {
          case TimestampType | TimestampNTZType =>
            import org.apache.parquet.schema.LogicalTypeAnnotation
            fs.getType(fs.getFieldIndex(f.name)).asPrimitiveType()
              .getLogicalTypeAnnotation match {
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                t.getUnit match {
                  case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000L
                  case LogicalTypeAnnotation.TimeUnit.MICROS => 1L
                  case LogicalTypeAnnotation.TimeUnit.NANOS => -1000L
                }
              case _ => 1L
            }
          case _ => 1L
        }
      }
      (fs, io, idx, scale)
    } catch { case e: Throwable => reader.close(); throw e }

  private var remainingToSkip = p.skip
  private var remainingToTake = p.take
  private var groupReader: org.apache.parquet.io.RecordReader[Group] = _
  private var groupRowsLeft = 0L
  private var current: InternalRow = _

  private def advanceRowGroup(): Boolean = {
    // skip whole row groups that end before our range starts — metadata only
    var pages = reader.readNextRowGroup()
    while (pages != null && remainingToSkip >= pages.getRowCount) {
      remainingToSkip -= pages.getRowCount
      pages = reader.readNextRowGroup()
    }
    if (pages == null) false
    else {
      groupReader = columnIO.getRecordReader(pages, new GroupRecordConverter(fileSchema))
      groupRowsLeft = pages.getRowCount
      true
    }
  }

  override def next(): Boolean = {
    if (remainingToTake <= 0) return false
    while (groupRowsLeft == 0) if (!advanceRowGroup()) return false
    // decode-skip leading rows inside the first row group of the range
    while (remainingToSkip > 0 && groupRowsLeft > 0) {
      groupReader.read(); groupRowsLeft -= 1; remainingToSkip -= 1
      while (groupRowsLeft == 0) if (!advanceRowGroup()) return false
    }
    val g = groupReader.read()
    groupRowsLeft -= 1
    remainingToTake -= 1
    current = convert(g)
    true
  }

  private def convert(g: Group): InternalRow = {
    val row = new GenericInternalRow(p.schema.length)
    var i = 0
    while (i < p.schema.length) {
      val idx = fieldIdx(i)
      if (g.getFieldRepetitionCount(idx) == 0) row.setNullAt(i)
      else p.schema.fields(i).dataType match {
        case LongType => row.setLong(i, g.getLong(idx, 0))
        case TimestampType | TimestampNTZType =>
          val raw = g.getLong(idx, 0)
          row.setLong(i, if (tsScale(i) > 0) raw * tsScale(i) else raw / -tsScale(i))
        case IntegerType | DateType => row.setInt(i, g.getInteger(idx, 0))
        case DoubleType => row.setDouble(i, g.getDouble(idx, 0))
        case FloatType => row.setFloat(i, g.getFloat(idx, 0))
        case BooleanType => row.setBoolean(i, g.getBoolean(idx, 0))
        case StringType =>
          row.update(i, UTF8String.fromBytes(g.getBinary(idx, 0).getBytes))
        case BinaryType => row.update(i, g.getBinary(idx, 0).getBytes)
        case dt => throw new UnsupportedOperationException(
          s"replay source: unsupported column type $dt for field ${p.schema.fields(i).name}")
      }
      i += 1
    }
    row
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
