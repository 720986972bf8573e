package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the hard-negative band semantics on hand-built vectors whose
  * cosines are known exactly: the dup zone and the easy zone are both
  * excluded, ranks order by score inside the band, k truncates.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // anchor a = (1, 0). Candidates at known cosines to a:
  //   c10 = (1, 0)      -> 1.0   (dup zone, excluded)
  //   c11 = (0.9, 0.1)  -> ~0.994 (dup zone, excluded)
  //   c12 = (1, 1)      -> ~0.707 (hard band [0.3, 0.95))
  //   c13 = (1, 2)      -> ~0.447 (hard band)
  //   c14 = (1, 10)     -> ~0.0995 (easy zone, excluded)
  //   c15 = (0, 1)      -> 0.0   (easy zone, excluded)
  private val vecs = Seq(
    (1L, Seq(1.0, 0.0)),
    (10L, Seq(1.0, 0.0)), (11L, Seq(0.9, 0.1)), (12L, Seq(1.0, 1.0)),
    (13L, Seq(1.0, 2.0)), (14L, Seq(1.0, 10.0)), (15L, Seq(0.0, 1.0)))
    .toDF("vec_id", "v")

  test("band excludes dup zone and easy zone; ranks order by score") {
    val got = Mining.hardNegatives(
      vecs.filter(col("vec_id") === 1L), "vec_id", vecs, "vec_id", "v",
      k = 3, loBand = 0.30, hiBand = 0.95)
      .select(col("rank"), col("cid")).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 12L), (2L, 13L)),
      "only the two in-band candidates, best cosine first")
  }

  test("k truncates and self is never a candidate") {
    val got = Mining.hardNegatives(
      vecs.filter(col("vec_id") === 1L), "vec_id", vecs, "vec_id", "v",
      k = 1, loBand = 0.30, hiBand = 1.5)
      .select(col("cid")).as[Long].collect().toSeq
    // with hiBand above 1, the dup-zone candidates enter; best non-self
    // is the identical vector c10 (cos 1.0), never the anchor itself
    assert(got === Seq(10L))
  }

  test("degenerate band is refused") {
    intercept[IllegalArgumentException] {
      Mining.hardNegatives(vecs, "vec_id", vecs, "vec_id", "v",
        k = 3, loBand = 0.5, hiBand = 0.5)
    }
  }
}
