package graft.routing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's core capability — schema-keyed event routing — as a
  * single-pass, declarative Spark transformation.
  *
  * Semantics mirror `processEvent` (reference: lib/kinesisHandler.js:107-124)
  * branch-for-branch, in the same short-circuit order:
  *
  *   1. undecodable record (missing `kinesis.data`, bad base64, corrupt JSON)
  *      → bad message                         (ref :163-166, 167-174)
  *   2. missing envelope `schema`             → bad message (ref :108-109)
  *   3. wrong envelope schema id              → bad message (ref :110-111)
  *   4. envelope fails validation             → bad message (ref :112-113)
  *   5. unregistered `data.schema`            → SKIPPED, not an error
  *      (logged + acked in the reference, :120-123 — load-bearing: it lets
  *      many consumers with disjoint registries share one stream)
  *   6. payload fails its registered schema   → bad message (ref :115-116)
  *   7. otherwise                             → routed to the handler
  *      registered for `data.schema`          (ref :114,118)
  *
  * Bad messages are *quarantined, not fatal*: the reference counts them as
  * successes to avoid poison-pill retry loops (ref :145-149) — here they land
  * in a dead-letter DataFrame with a `reason` column, and the main output
  * stays clean. Infrastructure errors still propagate as task failures
  * (Spark's retry = the Lambda re-poll).
  *
  * Scale design: routing is ONE projection computing a tag column — not N
  * passes over the input. Branch views are filters on the tag, so when the
  * caller materializes the tagged frame once (or uses `foreachBatch` in
  * streaming), the source is scanned once regardless of how many schemas are
  * registered. All predicates are built-in codegen'd expressions inside one
  * WholeStageCodegen stage; nothing here shuffles.
  */
object Router {

  /** Routing verdict tags carried in the `__route` column. */
  val TagCol = "__route"
  val ReasonCol = "__reason"
  val BadMessage = "badmsg"
  val Skipped = "skipped"
  def branch(schemaId: String): String = s"branch:$schemaId"

  /** A handler registration: payload constraints + the transformation to
    * apply to that branch (the reference's `registerSchemaMethodPair`,
    * lib/kinesisHandler.js:91-99).
    */
  final case class Registration(schema: RegisteredSchema,
                                handler: DataFrame => DataFrame)

  final case class Config(
      eventSchemaId: String,
      envelope: RegisteredSchema,
      registry: Map[String, Registration],
      /** column holding the decoded event struct (see [[EventCodec]]) */
      eventCol: String = "event")

  /** Result of routing: per-schema branches plus the two side outputs. */
  final case class Routed(
      tagged: DataFrame,
      branches: Map[String, DataFrame],
      badMessages: DataFrame,
      skipped: DataFrame)

  /** Compute the routing tag for each row (single pass, no shuffle). */
  def tag(df: DataFrame, config: Config): DataFrame = {
    val ev = col(config.eventCol)
    val dataSchema = ev.getField("data").getField("schema")
    val registeredIds = config.registry.keys.toSeq

    val verdict =
      when(ev.isNull, lit(BadMessage))
        .when(ev.getField("schema").isNull, lit(BadMessage))
        .when(ev.getField("schema") =!= config.eventSchemaId, lit(BadMessage))
        .when(!config.envelope.valid(ev), lit(BadMessage))
        .when(dataSchema.isNull || !dataSchema.isin(registeredIds: _*), lit(Skipped))
        .when(!payloadValid(ev, config), lit(BadMessage))
        .otherwise(concat(lit("branch:"), dataSchema))

    val reason =
      when(ev.isNull, lit("undecodable"))
        .when(ev.getField("schema").isNull, lit("missing schema"))
        .when(ev.getField("schema") =!= config.eventSchemaId, lit("wrong event schema"))
        .when(!config.envelope.valid(ev), lit("invalid envelope"))
        .when(dataSchema.isNull || !dataSchema.isin(registeredIds: _*), lit("unregistered schema"))
        .when(!payloadValid(ev, config), lit("invalid payload"))
        .otherwise(lit(null).cast("string"))

    df.withColumn(TagCol, verdict).withColumn(ReasonCol, reason)
  }

  private def payloadValid(ev: Column, config: Config): Column = {
    val dataSchema = ev.getField("data").getField("schema")
    config.registry.foldLeft(lit(true)) { case (acc, (id, reg)) =>
      acc && (dataSchema =!= id || reg.schema.valid(ev.getField("data")))
    }
  }

  /** Single-pass routed sink: tag once and write every branch plus the
    * dead-letter and skipped outputs in ONE scan via a partitioned write —
    * `basePath/<TagCol>=branch:<id>/...`, `.../badmsg/`, `.../skipped/`.
    * This is the at-scale shape for "fan out a stream to per-schema
    * datasets": no per-branch re-scan, and downstream readers get partition
    * pruning on the route tag for free.
    */
  def writeRouted(df: DataFrame, config: Config, basePath: String,
                  format: String = "parquet"): Unit =
    tag(df, config)
      .write.mode("overwrite")
      .partitionBy(TagCol)
      .format(format)
      .save(basePath)

  /** Route a decoded batch: tag once, then expose branch/dead-letter/skipped
    * views and apply each registered handler to its branch.
    */
  def route(df: DataFrame, config: Config): Routed = {
    val tagged = tag(df, config)
    val branches = config.registry.map { case (id, reg) =>
      id -> reg.handler(tagged.filter(col(TagCol) === branch(id))
        .drop(TagCol, ReasonCol))
    }
    Routed(
      tagged = tagged,
      branches = branches,
      badMessages = tagged.filter(col(TagCol) === BadMessage),
      skipped = tagged.filter(col(TagCol) === Skipped).drop(TagCol, ReasonCol))
  }
}
