package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly") {
    def localZ(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (255L, 255L), (149L, 490L))
    val got = pairs.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 9)).as[Long].collect()
    assert(got.toSeq === pairs.map(p => localZ(p._1, p._2, 9)))
  }

  test("z-sort gives better 2-D block locality than 1-D sort") {
    // grid of points; compare per-block (range_a + range_b) after sorting
    val pts = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val df = pts.toDF("a", "b")
    def blockSpread(ordered: Array[(Long, Long)]): Double =
      ordered.grouped(64).map { blk =>
        (blk.map(_._1).max - blk.map(_._1).min) + (blk.map(_._2).max - blk.map(_._2).min)
      }.sum.toDouble / (ordered.length / 64)
    val zOrdered = df.withColumn("z", Layout.zValue(col("a"), col("b"), 6))
      .orderBy("z").select("a", "b").as[(Long, Long)].collect()
    val aOrdered = df.orderBy("a", "b").select("a", "b").as[(Long, Long)].collect()
    // 1-D sort: each 64-row block spans the full b range (63) but one a value.
    // Z-order: each block is an 8x8 tile (7 + 7).
    assert(blockSpread(zOrdered) < blockSpread(aOrdered) / 2,
      s"z=${blockSpread(zOrdered)} vs a=${blockSpread(aOrdered)}")
  }
}
