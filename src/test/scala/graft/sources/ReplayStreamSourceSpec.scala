package graft.sources

import graft.SparkSpec
import graft.routing._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class ReplayStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  test("replay source streams the fixture in fixed-size micro-batches") {
    val stream = spark.readStream
      .format(classOf[ReplayStreamSource].getName)
      .option("path", s"$sf0001/events.parquet")
      .option("batchSize", "250")
      .load()

    var batchSizes = Vector.empty[Long]
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes :+= batch.count()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    assert(batchSizes.sum === 1000L, s"all fixture rows replayed: $batchSizes")
    assert(batchSizes.count(_ > 0) >= 4, s"multiple micro-batches: $batchSizes")
    assert(batchSizes.forall(_ <= 250L), s"batchSize respected: $batchSizes")
  }

  test("restart from checkpoint resumes at committed offsets (no replays)") {
    val checkpoint = java.nio.file.Files.createTempDirectory("replay_ckpt").toString
    def run(): Long = {
      var n = 0L
      val q = spark.readStream
        .format(classOf[ReplayStreamSource].getName)
        .option("path", s"$sf0001/events.parquet")
        .option("batchSize", "300")
        .load()
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          n += batch.count()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      n
    }
    assert(run() === 1000L, "first run drains the snapshot")
    assert(run() === 0L, "second run resumes at the committed end: nothing to replay")
  }

  test("routing over the replay stream equals batch routing") {
    val registry = Seq("click", "purchase").map { t =>
      t -> Router.Registration(RegisteredSchema(t, Nil),
        identity[org.apache.spark.sql.DataFrame])
    }.toMap
    val config = Router.Config("env/1", RegisteredSchema("env/1", Nil), registry)
    def decorate(df: org.apache.spark.sql.DataFrame) = df.withColumn("event",
      struct(lit("env/1").as("schema"),
        struct(col("event_type").as("schema")).as("data")))

    val batchCounts = Router.tag(
      decorate(spark.read.parquet(s"$sf0001/events.parquet")), config)
      .groupBy(Router.TagCol).count().as[(String, Long)].collect().toMap

    val stream = spark.readStream
      .format(classOf[ReplayStreamSource].getName)
      .option("path", s"$sf0001/events.parquet")
      .option("batchSize", "400")
      .load()

    var streamCounts = Map.empty[String, Long]
    val q = graft.streaming.StreamingRouter.foreachRoutedBatch(
      decorate(stream), config) { (routed, _) =>
      routed.tagged.groupBy(Router.TagCol).count()
        .as[(String, Long)].collect().foreach { case (k, v) =>
          streamCounts += k -> (streamCounts.getOrElse(k, 0L) + v)
        }
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    assert(streamCounts === batchCounts)
  }
}
