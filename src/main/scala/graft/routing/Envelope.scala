package graft.routing

import org.apache.spark.sql.types._

/** Column-level model of the Kinesis record envelope.
  *
  * The reference consumes a batch object with a `Records[]` array, each record
  * carrying `kinesis.data` (base64 payload), `kinesis.partitionKey`,
  * `kinesis.sequenceNumber`, `kinesis.approximateArrivalTimestamp` and
  * provenance fields (reference: lib/kinesisHandler.js:20-57, asserted at
  * 135-139 / 319-323). In Spark the batch is simply a DataFrame with one row
  * per record; this object pins the canonical schema for it.
  */
object Envelope {

  /** `record.kinesis` struct (reference: lib/kinesisHandler.js:22-29). */
  val kinesisStruct: StructType = StructType(Seq(
    StructField("data", StringType),                          // base64 UTF-8 JSON
    StructField("partitionKey", StringType),                  // ordering domain
    StructField("sequenceNumber", StringType),                // monotone per shard
    StructField("approximateArrivalTimestamp", DoubleType),   // epoch seconds
    StructField("kinesisSchemaVersion", StringType)
  ))

  /** One Kinesis record (reference: lib/kinesisHandler.js:24-38). */
  val recordSchema: StructType = StructType(Seq(
    StructField("kinesis", kinesisStruct),
    StructField("eventSource", StringType),
    StructField("eventID", StringType),
    StructField("eventName", StringType),
    StructField("eventSourceARN", StringType),
    StructField("awsRegion", StringType),
    StructField("invokeIdentityArn", StringType)
  ))

  /** Decoded two-level self-describing payload: outer `schema` plus
    * `data.schema` that selects the handler (reference:
    * lib/kinesisHandler.js:108-118). `data` payload fields beyond `schema`
    * are type-specific; callers extend this struct per registered type.
    */
  def payloadSchema(dataFields: Seq[StructField]): StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("data", StructType(StructField("schema", StringType) +: dataFields)),
    StructField("origin", StringType),
    StructField("timestamp", StringType)
  ))
}
