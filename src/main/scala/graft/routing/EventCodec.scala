package graft.routing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Decode/encode the reference's wire format with built-in, codegen'd
  * expressions only.
  *
  * Reference behavior: `new Buffer(record.kinesis.data, 'base64').toString()`
  * then `JSON.parse(payload)` with parse failure quarantined as a bad message
  * rather than failing the batch (reference: lib/kinesisHandler.js:169,
  * 167-174, 286-293). Spark-first mapping: `unbase64` + `from_json`, where
  * `from_json` yields NULL on corrupt input — the NULL is the quarantine
  * signal picked up by [[Router]].
  */
object EventCodec {

  /** Base64 → UTF-8 string. NULL on invalid input rather than an error —
    * `try_to_binary` keeps the quarantine contract even under ANSI mode
    * (plain `unbase64` throws on malformed base64 in Spark 4, which would
    * fail the batch — exactly what the reference avoids, ref :167-174).
    */
  def decodeBase64(data: Column): Column =
    call_function("try_to_binary", data, lit("base64")).cast("string")

  /** Full decode: base64 payload column → typed event struct. Corrupt base64
    * or JSON that does not parse as `schema` yields NULL (quarantine signal).
    */
  def decodeEvent(data: Column, schema: StructType): Column =
    from_json(decodeBase64(data), schema)

  /** Attach a decoded `event` struct column from `kinesis.data`. */
  def withDecodedEvent(records: DataFrame, schema: StructType,
                       eventCol: String = "event"): DataFrame =
    records.withColumn(eventCol, decodeEvent(col("kinesis.data"), schema))

  /** Inverse (test fixtures / round-trips): struct → base64 JSON string. */
  def encodeEvent(event: Column): Column = base64(to_json(event).cast("binary"))
}
