package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences matches a global-order window prefix sum") {
    val docs = spark.range(1, 201).select(col("id").as("doc_id"),
      (pmod(col("id") * 37, lit(90)) + 10).as("n"))
    val packed = Packing.packSequences(docs, "doc_id", col("n"), budget = 128)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    val expected = docs
      .withColumn("cw", sum(col("n")).over(w))
      .select(col("doc_id"), expr("(cw - n) div 128").as("chunk_id"))
      .as[(Long, Long)].collect().toMap
    assert(packed === expected)
  }

  test("packSequences is invariant to input partitioning") {
    val docs = spark.range(1, 101).select(col("id").as("doc_id"),
      (pmod(col("id") * 13, lit(50)) + 5).as("n"))
    val a = Packing.packSequences(docs.repartition(1), "doc_id", col("n"), 64)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    val b = Packing.packSequences(docs.repartition(11), "doc_id", col("n"), 64)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("lengthBucketBatches buckets, ranks, and cuts batches exactly") {
    val docs = spark.range(1, 301).select(col("id").as("doc_id"),
      (pmod(col("id") * 53, lit(400)) + 1).as("n"))
    val got = Packing.lengthBucketBatches(docs, "doc_id", col("n"), batchSize = 8)
      .select("doc_id", "bucket", "batch_id", "pos_in_batch")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val ladder = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L)
    val ref = docs.as[(Long, Long)].collect()
      .map { case (id, n) => (id, ladder.find(n <= _).getOrElse(1024L)) }
      .groupBy(_._2).toSeq.flatMap { case (b, grp) =>
        grp.sortBy(_._1).zipWithIndex.map { case ((id, _), i) =>
          (id, b, i.toLong / 8, i.toLong % 8)
        }
      }.sortBy(_._1)
    assert(got.toSeq === ref)
    // batch sizes: every batch full except possibly the last per bucket
    val sizes = got.groupBy(r => (r._2, r._3)).map { case (k, rs) => k -> rs.length }
    sizes.groupBy(_._1._1).foreach { case (_, batches) =>
      val partial = batches.count(_._2 < 8)
      assert(partial <= 1, s"more than one partial batch in a bucket: $batches")
    }
  }

  test("lengthBucketBatches is invariant to input partitioning") {
    val docs = spark.range(1, 101).select(col("id").as("doc_id"),
      (pmod(col("id") * 29, lit(200)) + 1).as("n"))
    def run(parts: Int) =
      Packing.lengthBucketBatches(docs.repartition(parts), "doc_id", col("n"), 4)
        .select("doc_id", "bucket", "batch_id").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    assert(run(1) === run(13))
  }

  test("chunkWithOverlap covers every token with the documented stride") {
    val docs = Seq((1L, 10L), (2L, 40L), (3L, 41L), (4L, 100L)).toDF("doc_id", "n")
    val chunks = Packing.chunkWithOverlap(docs, col("n"), size = 40, stride = 20)
      .select("doc_id", "chunk_idx", "start_tok", "end_tok")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(chunks(1L) === Seq((1L, 0L, 0L, 10L)))
    assert(chunks(2L) === Seq((2L, 0L, 0L, 40L)))
    assert(chunks(3L) === Seq((3L, 0L, 0L, 40L), (3L, 1L, 20L, 41L)))
    assert(chunks(4L) === Seq((4L, 0L, 0L, 40L), (4L, 1L, 20L, 60L),
      (4L, 2L, 40L, 80L), (4L, 3L, 60L, 100L)))
    // coverage: chunk starts step by stride, ends reach n
    chunks.values.foreach { cs =>
      assert(cs.head._3 == 0L)
      assert(cs.last._4 == cs.last._4.max(cs.map(_._4).max))
      cs.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 - a._3 == 20L)
        case _ =>
      }
    }
  }

  test("groupTokenBudget keeps a prefix per group within the budget") {
    val docs = Seq(
      ("s1", 1L, 300L), ("s1", 2L, 150L), ("s1", 3L, 100L), ("s1", 4L, 50L),
      ("s2", 5L, 600L), ("s2", 6L, 10L)
    ).toDF("source", "doc_id", "n")
    val out = Packing.groupTokenBudget(docs, "source", "doc_id", col("n"), 500)
      .orderBy("source")
      .select("source", "n_docs", "n_kept", "tokens_kept")
      .as[(String, Long, Long, Long)].collect().toSeq
    // s1: 300, 450, 550(stop), ... -> kept docs 1,2 (450 tokens)
    // s2: 600 blows the budget immediately -> nothing kept
    assert(out === Seq(("s1", 4L, 2L, 450L), ("s2", 2L, 0L, 0L)))
  }
}
