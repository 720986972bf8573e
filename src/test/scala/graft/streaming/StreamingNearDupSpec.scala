package graft.streaming

import graft.SparkSpec
import graft.sources.ReplayStreamSource
import org.apache.spark.sql.streaming.Trigger

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  // Three distinct base texts, long enough to shingle; "a8x" is a one-token
  // edit of "a" (near-dup), "c" is unrelated.
  private val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val textA2 = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
  private val textB = "one two three four five six seven eight nine ten"
  private val textC = "red orange yellow green blue indigo violet black white gray"

  test("cross-batch and in-batch near-dups are dropped; novel docs survive") {
    val dir = java.nio.file.Files.createTempDirectory("neardup").toString
    val docsPath = s"$dir/docs.parquet"
    val indexPath = s"$dir/bandindex"

    // batch 1: A, B     batch 2: A-copy (dup), A2 (near-dup), C (novel)
    // batchSize=2 slices the replay snapshot into those two batches in
    // doc_id order.
    Seq(
      (0L, textA), (1L, textB),
      (2L, textA), (3L, textA2), (4L, textC))
      .toDF("doc_id", "text")
      .coalesce(1).orderBy("doc_id").write.parquet(docsPath)

    val stream = spark.readStream
      .format(classOf[ReplayStreamSource].getName)
      .option("path", docsPath)
      .option("batchSize", "2")
      .load()

    var survivors = Vector.empty[(Long, Long)] // (batchId, doc_id)
    val q = StreamingNearDup.foreachDedupedBatch(
      stream, "doc_id", "text", indexPath) { (batch, id) =>
      survivors ++= batch.select("doc_id").as[Long].collect().sorted.map(id -> _)
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val kept = survivors.map(_._2).toSet
    assert(kept.contains(0L) && kept.contains(1L), s"batch-1 docs are novel: $survivors")
    assert(!kept.contains(2L), s"exact copy of an indexed doc must drop: $survivors")
    assert(!kept.contains(3L), s"near-dup (1-token edit) must drop: $survivors")
    assert(kept.contains(4L), s"unrelated doc must survive: $survivors")

    // the index holds band keys only for survivors
    val indexed = spark.read.parquet(indexPath)
    assert(indexed.select("band_key").distinct().count() > 0)
    assert(indexed.columns.toSet === Set("band", "band_key"))
  }

  test("replaying the same docs against an existing index drops everything") {
    val dir = java.nio.file.Files.createTempDirectory("neardup2").toString
    val docsPath = s"$dir/docs.parquet"
    val indexPath = s"$dir/bandindex"
    Seq((0L, textA), (1L, textB)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(docsPath)

    def run(): Long = {
      var n = 0L
      val q = StreamingNearDup.foreachDedupedBatch(
        spark.readStream.format(classOf[ReplayStreamSource].getName)
          .option("path", docsPath).option("batchSize", "10").load(),
        "doc_id", "text", indexPath) { (batch, _) => n += batch.count() }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      n
    }
    assert(run() === 2L, "first pass: both docs novel")
    assert(run() === 0L, "second pass: all near-dup vs the persisted index")
  }
}
