package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("2-D front keeps exactly the non-dominated rows (duplicates both kept)") {
    val pts = Seq((5L, 1L), (4L, 3L), (4L, 3L), (3L, 2L), (3L, 5L),
      (2L, 6L), (2L, 4L), (1L, 7L)).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val kept = Skyline.front2D(pts, "x", "y")
      .select("x", "y").as[(Long, Long)].collect().sorted.toSeq
    assert(kept === Seq((1L, 7L), (2L, 6L), (3L, 5L), (4L, 3L), (4L, 3L), (5L, 1L)))
  }

  test("exclusive prefix max matches brute force across bucket counts") {
    val rows = Seq(1L -> 4L, 2L -> 9L, 3L -> 1L, 4L -> 7L, 5L -> 7L,
      6L -> 2L, 7L -> 8L, 8L -> 3L, 9L -> 5L, 10L -> 6L)
    val expect = rows.map { case (k, _) =>
      val above = rows.filter(_._1 > k).map(_._2)
      k -> (if (above.isEmpty) None else Some(above.max))
    }.toMap
    Seq(1, 3, 32).foreach { p =>
      val out = Skyline.exclusivePrefixMaxDesc(
        rows.toDF("k", "v"), "k", "v", "m", numParts = p)
        .select("k", "m").as[(Long, Option[Long])].collect().toMap
      assert(out === expect, s"numParts=$p")
    }
  }

  test("duplicate keys in a direct exclusivePrefixMaxDesc call fail loudly") {
    // the strictly-before window is rowsBetween over key DESC — an equal key
    // in a preceding row would leak into the "strictly greater" max, so
    // uniqueness is enforced, not just documented
    val dup = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      Skyline.exclusivePrefixMaxDesc(dup, "k", "v", "m").collect()
    }
    assert(ex.getMessage.contains("UNIQUE"))
  }

  test("empty input returns an empty typed frame") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(Skyline.exclusivePrefixMaxDesc(empty, "k", "v", "m").count() === 0)
    assert(Skyline.front2D(Seq.empty[(Long, Long, Long)].toDF("id", "x", "y"),
      "x", "y").count() === 0)
  }

  test("front property on the fixture corpus: no kept row dominates another") {
    val sig = graft.text.GopherRules.repetitionSignals(
      spark.read.parquet(s"$sf0001/documents.parquet"), "text")
      .select(col("doc_id"), col("n_words"), col("ttr_permille"))
    val front = Skyline.front2D(sig, "n_words", "ttr_permille")
      .select("n_words", "ttr_permille").as[(Long, Long)].collect()
    assert(front.nonEmpty)
    front.foreach { case (x, y) =>
      assert(!front.exists { case (x2, y2) =>
        (x2 >= x && y2 >= y) && (x2 > x || y2 > y) },
        s"($x,$y) dominated within the front")
    }
    // and every front row dominates or ties every corpus row on SOME axis
    val all = sig.select("n_words", "ttr_permille").as[(Long, Long)].collect()
    all.foreach { case (x, y) =>
      assert(front.exists { case (fx, fy) => fx >= x && fy >= y },
        s"corpus point ($x,$y) outside the dominated region")
    }
  }
}
