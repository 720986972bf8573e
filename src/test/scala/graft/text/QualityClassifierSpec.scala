package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Hand-computable corpus: token counts (cpos, cneg) are
  //   good (2, 0) · bad (0, 2) · the (1, 2)  ⇒  tp=3, tn=4, v=3
  // bits = ⌊log₂((T_c + v) div (ct_c + 1))⌋:
  //   good bp=⌊log₂(6÷3)⌋=1  bn=⌊log₂(7÷1)⌋=2
  //   bad  bp=⌊log₂(6÷1)⌋=2  bn=⌊log₂(7÷3)⌋=1
  //   the  bp=⌊log₂(6÷2)⌋=1  bn=⌊log₂(7÷3)⌋=1
  private val docs = Seq(
    (1L, "good good the", true),
    (2L, "bad bad the", false),
    (3L, "the", false)
  ).toDF("doc_id", "text", "pos")

  test("classCounts aggregates per-class token occurrences") {
    val cc = QualityClassifier.classCounts(docs, "doc_id", "text", col("pos"))
      .orderBy("t").as[(String, Long, Long)].collect().toSeq
    assert(cc === Seq(("bad", 0L, 2L), ("good", 2L, 0L), ("the", 1L, 2L)))
  }

  test("tokenBits matches the hand-computed integer surprisals") {
    val cc = QualityClassifier.classCounts(docs, "doc_id", "text", col("pos"))
    val wt = QualityClassifier.tokenBits(cc)
      .orderBy("t").as[(String, Long, Long)].collect().toSeq
    assert(wt === Seq(("bad", 2L, 1L), ("good", 1L, 2L), ("the", 1L, 1L)))
  }

  test("score classifies by cheaper class fit and breaks ties negative") {
    val sc = QualityClassifier.score(docs, "doc_id", "text", col("pos"))
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "bits_pos", "bits_neg", "margin_bits", "predicted")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(sc === Seq(
      (1L, 3L, 3L, 5L, 2L, "pos"),    // 2·good + the under each model
      (2L, 3L, 5L, 3L, -2L, "neg"),
      (3L, 1L, 1L, 1L, 0L, "neg")))   // exact tie -> negative
  }
}
