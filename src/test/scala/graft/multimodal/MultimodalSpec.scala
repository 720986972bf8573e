package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.decodeStub(
    Multimodal.attachBinary(Seq(
      (1L, "x" * 100), (2L, "y" * 640), (3L, "z" * 1000)).toDF("id", "payload"),
      "payload"))

  test("stub decode derives deterministic metadata from bytes") {
    val metas = media
      .select(col("id"), col("meta.bytes"), col("meta.width"), col("meta.n_frames"))
      .as[(Long, Long, Int, Int)].collect()
      .map { case (a, b, c, d) => a -> ((b, c, d)) }.toMap
    assert(metas(1L) === ((100L, 101, 11)))
    assert(metas(2L) === ((640L, 1, 11)))
  }

  test("resize preserves aspect ratio within the target box") {
    val resized = Multimodal.resizeStub(media, 64, 64)
      .select(col("id"), col("meta.width"), col("meta.height"))
      .as[(Long, Int, Int)].collect()
    resized.foreach { case (id, w, h) =>
      assert(w <= 64 && h <= 64 && w >= 1 && h >= 1, s"id $id resized to ${w}x$h")
    }
  }

  test("frame sampling explodes stride-spaced indices") {
    val frames = Multimodal.sampleFrames(media, stride = 5)
      .groupBy(col("id")).agg(collect_list(col("frame_idx")).as("idx"))
      .as[(Long, Seq[Int])].collect().toMap
    // n_frames for 100 bytes = 100 % 30 + 1 = 11 → indices 0,5,10
    assert(frames(1L).sorted === Seq(0, 5, 10))
  }

  test("batched feature extraction emits fixed-width histograms") {
    val feats = Multimodal.extractFeaturesStub(media, dim = 16)
      .select(col("id"), col("features")).as[(Long, Seq[Float])].collect().toMap
    assert(feats.values.forall(_.length === 16))
    assert(feats(1L).sum === 100f, "histogram mass equals byte count")
  }
}
