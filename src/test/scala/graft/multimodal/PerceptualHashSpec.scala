package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
    (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // near dup of 1
    (4L, "completely different words nowhere near the others at all")
  ).toDF("doc_id", "text")

  private def media = Multimodal.attachBinary(docs, "text")

  test("identical payloads hash identically and pair at hamming 0") {
    val pairs = PerceptualHash.nearDupPairs(media, "doc_id")
      .as[(Long, Long, Long, Long)].collect()
    val dup = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(dup.isDefined, "exact dup pair (1,2) must surface")
    assert(dup.get._3 === 0L, "dHash hamming of identical payloads is 0")
    assert(dup.get._4 === 0L, "aHash hamming of identical payloads is 0")
  }

  test("banding equals brute force for hamming <= 3 (pigeonhole)") {
    val h = PerceptualHash.hashes(
      PerceptualHash.pixelGridStub(media, "doc_id"))
    val l = h.select(col("id").as("id1"), col("dhash").as("d1"))
    val r = h.select(col("id").as("id2"), col("dhash").as("d2"))
    val brute = l.join(r, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        PerceptualHash.hamming(col("d1"), col("d2")).cast("long").as("hd"))
      .filter(col("hd") <= 3)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    val banded = PerceptualHash.nearDupPairs(media, "doc_id")
      .as[(Long, Long, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    assert(banded === brute)
  }

  test("hashes are packed 60-bit longs with deterministic values") {
    val h = PerceptualHash.hashes(
      PerceptualHash.pixelGridStub(media, "doc_id"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // 60-bit range, non-negative
    h.values.foreach { case (a, d) =>
      assert(a >= 0L && a < (1L << 60))
      assert(d >= 0L && d < (1L << 60))
    }
    // identical payloads → identical hashes; rerun → same values
    assert(h(1L) === h(2L))
    val again = PerceptualHash.hashes(
      PerceptualHash.pixelGridStub(media, "doc_id"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(again === h)
  }

  test("a hand-checked grid produces the expected bits") {
    // grid with cells 0..59: c0=5, c1=1, rest 0 → total 6
    val grid = spark.range(1).select(
      (lit(7L).as("id") +:
        (0 until 60).map(g => (if (g == 0) lit(5L) else if (g == 1) lit(1L)
        else lit(0L)).as(s"c$g"))): _*)
    val (a, d) = PerceptualHash.hashes(grid)
      .as[(Long, Long, Long)].collect().map(t => (t._2, t._3)).head
    // aHash: 60*c_g > 6 → only c0 (300>6; c1: 60>6 too!) → bits 0 and 1
    assert(a === 3L, "aHash bits 0,1 set (60*5>6 and 60*1>6)")
    // dHash: c0>c1 (bit 0), c1>c2 (bit 1), c59>c0 is false; rest equal
    assert(d === 3L, "dHash bits 0,1 set")
  }

  test("a hot block bucket raises loudly instead of joining m^2 pairs") {
    val many = Multimodal.attachBinary(
      (1L to 12L).map(i => (i, "same text every time")).toDF("doc_id", "text"),
      "text")
    val e = intercept[Exception] {
      PerceptualHash.nearDupPairs(many, "doc_id", maxBucket = 10L).collect()
    }
    assert(e.getMessage.contains("block bucket exceeds"),
      s"unexpected error: ${e.getMessage}")
  }
}
