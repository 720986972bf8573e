package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized parity for the packing/ordering operators (same discipline as
  * OperatorParitySpec): the grouped two-phase prefix-sum rank math inside
  * lengthBucketBatches and the stride arithmetic inside strideInterleave
  * must match sequential references on random shapes.
  */
class PackingParitySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], trials: Int): Seq[A] =
    (1 to trials).flatMap(i => g.apply(Gen.Parameters.default, Seed(9090L + i)))

  test("lengthBucketBatches matches a sequential bucket/rank reference") {
    val ladder = Seq(4, 8, 16)
    val docGen = for {
      n <- Gen.chooseNum(5, 40)
      ids <- Gen.pick(n, (0L until 500L)).map(_.toSeq)
      lens <- Gen.listOfN(n, Gen.chooseNum(1, 20))
    } yield ids.zip(lens)
    samples(docGen, 6).foreach { rows =>
      val df = rows.map { case (id, len) => (id, Seq.fill(len)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Packing.lengthBucketBatches(df, "doc_id",
        size(split(col("text"), " ")), batchSize = 3, ladder = ladder,
        numParts = 4)
        .select("doc_id", "bucket", "batch_id", "pos_in_batch")
        .as[(Long, Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

      def bucketOf(len: Int): Long =
        ladder.find(len <= _).getOrElse(ladder.last).toLong
      val expect = rows.groupBy { case (_, len) => bucketOf(len) }
        .flatMap { case (b, grp) =>
          grp.sortBy(_._1).zipWithIndex.map { case ((id, _), i) =>
            id -> ((b, i.toLong / 3, i.toLong % 3))
          }
        }
      assert(got === expect, s"rows: $rows")
    }
  }

  test("strideInterleave positions match a sequential reference") {
    val docGen = for {
      n <- Gen.chooseNum(4, 25)
      ids <- Gen.pick(n, (0L until 300L)).map(_.toSeq)
      srcs <- Gen.listOfN(n, Gen.oneOf("s1", "s2", "s3"))
      scores <- Gen.listOfN(n, Gen.chooseNum(0L, 9L))
    } yield ids.lazyZip(srcs).lazyZip(scores).toList
    samples(docGen, 6).foreach { rows =>
      val got = Curriculum.strideInterleave(
        rows.toDF("doc_id", "source", "score"), "doc_id", "source", col("score"))
        .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap

      val srcs = rows.map(_._2).distinct.sorted
      val s = srcs.length.toLong
      val expect = rows.groupBy(_._2).flatMap { case (src, grp) =>
        val idx = srcs.indexOf(src).toLong
        grp.sortBy { case (id, _, sc) => (-sc, id) }.zipWithIndex.map {
          case ((id, _, _), r) => id -> (r.toLong * s + idx)
        }
      }
      assert(got === expect, s"rows: $rows")
      assert(got.values.toSeq.distinct.length === got.size, "positions collide")
    }
  }
}
