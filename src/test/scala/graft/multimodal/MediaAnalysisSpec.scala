package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("silence trim finds the maximal silent prefix and suffix") {
    // build a payload whose window amplitudes are controlled: windows of 1
    // token, so each token IS a window; pick tokens by their md5 amplitude
    val amps = (1 to 200).map(i => s"tok$i" ->
      (BigInt("0" + java.security.MessageDigest.getInstance("MD5")
        .digest(s"tok$i".getBytes("UTF-8")).take(8).map("%02x".format(_))
        .mkString.take(15), 16) % 100).toLong).toMap
    val quiet = amps.collectFirst { case (t, a) if a < 30 => t }.get
    val loud = amps.collectFirst { case (t, a) if a >= 30 => t }.get
    // payload: quiet quiet loud quiet loud quiet → lead 2, trail 1, kept 3
    val df = Seq((1L, Seq(quiet, quiet, loud, quiet, loud, quiet)
      .mkString(" "))).toDF("doc_id", "text")
    val led = MediaAnalysis.silenceTrimStub(
      Multimodal.attachBinary(df, "text"), "doc_id", windowTokens = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(led === ((1L, 6L, 4L, 2L, 1L, 3L)))
  }

  test("an all-silent payload trims everything") {
    val amps = (1 to 400).map(i => s"w$i" ->
      (BigInt("0" + java.security.MessageDigest.getInstance("MD5")
        .digest(s"w$i".getBytes("UTF-8")).take(8).map("%02x".format(_))
        .mkString.take(15), 16) % 100).toLong).toMap
    val quiets = amps.collect { case (t, a) if a < 30 => t }.take(3).toSeq
    val df = Seq((1L, quiets.mkString(" "))).toDF("doc_id", "text")
    val led = MediaAnalysis.silenceTrimStub(
      Multimodal.attachBinary(df, "text"), "doc_id", windowTokens = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(led === ((1L, 3L, 3L, 3L, 0L, 0L)))
  }

  test("scene cut detector recovers the planted shot structure") {
    val df = Seq((7L, "x" * 100)).toDF("doc_id", "text") // bytes=100
    // decode stub: n_frames = 100 % 30 + 1 = 11; shot_len = 100 % 7 + 3 = 5
    // → shots [0..4],[5..9],[10] → 2 cuts, 3 scenes
    val led = MediaAnalysis.sceneCutLedger(
      MediaAnalysis.frameSignaturesStub(
        Multimodal.attachBinary(df, "text"), "doc_id"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(led === ((7L, 11L, 2L, 3L, 3666L)))
  }

  test("same-shot frames share signatures; cross-shot differ widely") {
    val df = Seq((7L, "x" * 100)).toDF("doc_id", "text")
    val sigs = MediaAnalysis.frameSignaturesStub(
      Multimodal.attachBinary(df, "text"), "doc_id")
      .orderBy(col("f")).as[(Long, Long, Long)].collect().map(_._3)
    assert(sigs.slice(0, 5).distinct.length === 1)
    assert(sigs.slice(5, 10).distinct.length === 1)
    assert(java.lang.Long.bitCount(sigs(4) ^ sigs(5)) > 8)
  }
}
