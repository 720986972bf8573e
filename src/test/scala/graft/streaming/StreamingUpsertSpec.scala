package graft.streaming

import graft.SparkSpec
import graft.relational.TableMaintenance
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CDC materialization: a change feed arriving over micro-batches
  * folds into a running snapshot with foreachBatch + TableMaintenance.upsert
  * — the incremental MERGE pattern every table format implements. The
  * invariant under test: when versions arrive monotonically (the CDC log
  * contract), folding batch-by-batch equals one batch upsert of the whole
  * feed — including cross-batch version supersession and deletes of rows
  * upserted in an earlier batch.
  */
class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[(Long, String, Double)] =
    df.select("k", "status", "price").as[(Long, String, Double)].collect().toSet

  test("micro-batched upsert folds equal the one-shot batch merge") {
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "price")

    val input = MemoryStream[(Long, String, Long, String, Double)]
    var snapshot: DataFrame = base
    var feed = Seq.empty[(Long, String, Long, String, Double)]

    val q = input.toDF().toDF("k", "op", "version", "status", "price")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // localCheckpoint caps lineage growth across folds — each batch's
        // plan starts from the materialized snapshot, not the whole history
        snapshot = TableMaintenance.upsert(snapshot, batch, "k", "version",
          "op", Seq("status", "price")).localCheckpoint()
      }.start()
    try {
      input.addData((1L, "U", 1L, "x", 11.0), (9L, "U", 1L, "n", 99.0))
      q.processAllAvailable()
      feed ++= Seq((1L, "U", 1L, "x", 11.0), (9L, "U", 1L, "n", 99.0))

      // later batch supersedes key 1 and deletes the key 9 inserted above
      input.addData((1L, "U", 2L, "y", 12.0), (9L, "D", 2L, "-", 0.0))
      q.processAllAvailable()
      feed ++= Seq((1L, "U", 2L, "y", 12.0), (9L, "D", 2L, "-", 0.0))

      val oneShot = TableMaintenance.upsert(base,
        feed.toDF("k", "op", "version", "status", "price"),
        "k", "version", "op", Seq("status", "price"))
      assert(rows(snapshot) === rows(oneShot))
      assert(rows(snapshot) === Set((1L, "y", 12.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    } finally q.stop()
  }
}
