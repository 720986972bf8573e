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

  test("numBatches fixes the batch COUNT regardless of input size") {
    val stream = spark.readStream
      .format(classOf[ReplayStreamSource].getName)
      .option("path", s"$sf0001/events.parquet")
      .option("numBatches", "4")
      .load()

    var batchSizes = Vector.empty[Long]
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes :+= batch.count()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val nonEmpty = batchSizes.filter(_ > 0)
    assert(batchSizes.sum === 1000L, s"all fixture rows replayed: $batchSizes")
    assert(nonEmpty.size === 4, s"exactly numBatches micro-batches: $batchSizes")
    assert(nonEmpty.forall(_ === 250L), s"⌈1000/4⌉ rows per batch: $batchSizes")
  }

  test("multi-file directory input: offsets span files in name order, batches split mid-file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("replay_multi").toString
    // three files of 7, 5, 9 rows; name order fixes the global row order
    Seq((0 until 7, "a"), (7 until 12, "b"), (12 until 21, "c")).foreach {
      case (range, name) =>
        val tmp = s"$dir/tmp_$name"
        range.map(i => (i.toLong, s"v$i")).toDF("id", "s")
          .coalesce(1).orderBy("id").write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$dir/part_$name.parquet"))
        new java.io.File(tmp).listFiles().foreach(_.delete())
        new java.io.File(tmp).delete()
    }

    var batches = Vector.empty[Seq[Long]]
    val q = spark.readStream
      .format(classOf[ReplayStreamSource].getName)
      .option("path", dir)
      .option("batchSize", "6") // crosses the 7-row and 12-row file seams
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches :+= batch.select("id").as[Long].collect().toSeq.sorted
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    assert(batches.map(_.size).sum === 21L, s"all rows replayed once: $batches")
    assert(batches.flatten.sorted === (0L until 21L), s"no dupes or gaps: $batches")
    assert(batches.forall(_.size <= 6), s"batchSize respected across file seams: $batches")
  }

  test("executor-side reader preserves typed columns (timestamp, double, string)") {
    import spark.implicits._
    val path = s"$sf0001/orders.parquet"
    // money sum through exact decimal: a raw double sum is partition-order
    // dependent and the stream splits partitions differently than the scan
    val batch = spark.read.parquet(path)
      .agg(count(lit(1)), sum(col("o_totalprice").cast("decimal(12,2)")).cast("double"),
        max(col("o_orderdate")), min(col("o_orderpriority")))
      .as[(Long, Double, java.sql.Timestamp, String)].head()

    var streamed = Vector.empty[(Long, Double, java.sql.Timestamp, String)]
    val q = spark.readStream
      .format(classOf[ReplayStreamSource].getName)
      .option("path", path)
      .option("batchSize", "100000") // one batch: aggregate over the whole table
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        streamed :+= b.agg(count(lit(1)),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double"),
          max(col("o_orderdate")), min(col("o_orderpriority")))
          .as[(Long, Double, java.sql.Timestamp, String)].head()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    assert(streamed.size === 1)
    assert(streamed.head === batch,
      "replayed aggregates must equal the batch read (types decoded identically)")
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
