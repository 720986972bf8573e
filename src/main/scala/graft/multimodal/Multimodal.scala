package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata structs, processed in partition-sized batches.
  *
  * The decode step is STUBBED (this environment has no image/audio codecs):
  * `decodeStub` derives deterministic fake metadata from the byte length, so
  * the Spark-side contract — schema, batch shape, partitioning, null
  * behavior — is real and testable, and a codec-backed implementation swaps
  * in behind the same signatures.
  *
  * Scale notes: binary payloads ride the same partitions as their metadata
  * (no separate fetch per row); per-batch processing uses `mapPartitions`
  * so a real decoder amortizes model/codec init once per partition, the
  * same shape a Python pipeline gets from `mapInPandas`.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("bytes", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Attach an opaque binary media column (here: utf-8 bytes of a source
    * column stand in for real image/audio payloads).
    */
  def attachBinary(df: DataFrame, srcCol: String, mediaCol: String = "media"): DataFrame =
    df.withColumn(mediaCol, col(srcCol).cast("binary"))

  /** STUB decode: deterministic fake metadata from byte length. A real
    * implementation would parse the container header here; everything
    * downstream (schema, grouping, joins) is unchanged by the swap.
    */
  def decodeStub(df: DataFrame, mediaCol: String = "media",
                 metaCol: String = "meta"): DataFrame = {
    val n = octet_length(col(mediaCol)).cast("long")
    df.withColumn(metaCol, struct(
      n.as("bytes"),
      when(n % 3 === 0, "png").when(n % 3 === 1, "jpeg").otherwise("webp").as("format"),
      (n % 640 + 1).cast("int").as("width"),
      ((n * 7) % 480 + 1).cast("int").as("height"),
      (n % 30 + 1).cast("int").as("n_frames")))
  }

  /** Resize plumbing: rewrites the metadata to the target box preserving
    * aspect ratio (integer math — deterministic). A codec-backed version
    * would also transform the payload bytes; the schema contract is
    * identical, which is the point of the stub.
    */
  def resizeStub(df: DataFrame, maxW: Int, maxH: Int,
                 metaCol: String = "meta"): DataFrame = {
    val m = col(metaCol)
    val scaleNum = least(lit(maxW) * m.getField("height"), lit(maxH) * m.getField("width"))
    val w2 = (m.getField("width") * scaleNum /
      (m.getField("width") * m.getField("height"))).cast("int")
    val h2 = (m.getField("height") * scaleNum /
      (m.getField("width") * m.getField("height"))).cast("int")
    df.withColumn(metaCol, struct(
      m.getField("bytes").as("bytes"),
      m.getField("format").as("format"),
      greatest(w2, lit(1)).as("width"),
      greatest(h2, lit(1)).as("height"),
      m.getField("n_frames").as("n_frames")))
  }

  /** Frame sampling plumbing: every `stride`-th frame index up to n_frames.
    * Real decoder would emit frame bytes; the stub emits indices with the
    * correct explode/batch shape.
    */
  def sampleFrames(df: DataFrame, metaCol: String = "meta", stride: Int = 10): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), col(metaCol).getField("n_frames") - 1, lit(stride))))

  /** Batch feature-extraction shape over binary payloads: one pass per
    * partition, results as fixed-width float arrays. The "feature" here is a
    * deterministic byte histogram — stands in for a real encoder forward
    * pass with identical Spark-side plumbing (partition-amortized init,
    * iterator-to-iterator, no driver collect).
    */
  def extractFeaturesStub(df: DataFrame, mediaCol: String = "media", dim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("features", ArrayType(FloatType)))
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { it =>
      // (real impl: init codec/model once here, then stream the batch)
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val hist = new Array[Float](dim)
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) { hist(java.lang.Byte.toUnsignedInt(bytes(i)) % dim) += 1f; i += 1 }
        }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ hist.toSeq)
      }
    }
  }
}
