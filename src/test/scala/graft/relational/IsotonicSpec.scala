package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Boolean)]) =
    Isotonic.pavCalibration(rows.toDF("s", "pos"), "s", col("pos"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("a violation pools into its neighbors' exact block average") {
    // score 1: 0/2 pos; score 2: 2/2 (violates with 3); score 3: 1/2.
    // PAV pools {2,3} → 3/4 = 750‰; bin 1 stays 0.
    val rows = Seq((1L, false), (1L, false), (2L, true), (2L, true),
      (3L, true), (3L, false))
    assert(run(rows) === Seq(
      (1L, 2L, 0L, 0L, 0L),
      (2L, 2L, 2L, 1000L, 750L),
      (3L, 2L, 1L, 500L, 750L)))
  }

  test("an already-monotone sequence is untouched") {
    val rows = Seq((1L, false), (1L, false), (2L, true), (2L, false),
      (3L, true), (3L, true))
    assert(run(rows) === Seq(
      (1L, 2L, 0L, 0L, 0L),
      (2L, 2L, 1L, 500L, 500L),
      (3L, 2L, 2L, 1000L, 1000L)))
  }

  test("closed form matches the sequential stack PAV on random bins") {
    val rows = (1 to 400).map { i =>
      val s = (i * 2654435761L) % 17L
      (s, (i * 40503L) % 97L < 40L + 3L * s)
    }
    val got = run(rows).map { case (s, _, _, _, iso) => s -> iso }.toMap
    // reference: classic stack-based PAV over the same bins, exact
    // rational pooling, permille floor at the end
    val bins = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, rs) =>
        (s, rs.size.toLong, rs.count(_._2).toLong)
      }
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, List[Long])]
    bins.foreach { case (s, n, p) =>
      var blk = (n, p, List(s))
      while (stack.nonEmpty && {
        val (n0, p0, _) = stack.last
        p0 * blk._1 > blk._2 * n0  // rate(prev) > rate(next), exact
      }) {
        val (n0, p0, ss) = stack.remove(stack.length - 1)
        blk = (n0 + blk._1, p0 + blk._2, ss ++ blk._3)
      }
      stack += blk
    }
    val ref = stack.flatMap { case (n, p, ss) =>
      ss.map(_ -> 1000L * p / n)
    }.toMap
    assert(got === ref)
    // and the output is non-decreasing in score
    val ordered = run(rows).map(_._5)
    assert(ordered === ordered.sorted)
  }

  test("misuse fails loudly: unbounded bins, null scores") {
    val wide = (1L to 50L).map(s => (s, true)).toDF("s", "pos")
    intercept[IllegalArgumentException](
      Isotonic.pavCalibration(wide, "s", col("pos"), maxBins = 10))
    val withNull = Seq((Some(1L), true), (None, false)).toDF("s", "pos")
    intercept[IllegalArgumentException](
      Isotonic.pavCalibration(withNull, "s", col("pos")))
  }
}
