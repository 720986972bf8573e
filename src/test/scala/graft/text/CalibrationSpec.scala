package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly separable margins: two bins at 0 and 1000 permille") {
    val scored = (1L to 10L).map(m => (m, m, m >= 6L))
      .toDF("doc_id", "margin_bits", "pos")
    val out = QualityClassifier.calibrationBins(scored, col("pos"), nBins = 2)
      .select("bin", "n_docs", "n_pos", "pos_permille", "margin_min", "margin_max")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // median of 1..10 = 5.5 → bins split exactly at the label boundary
    assert(out.toSeq === Seq(
      (0L, 5L, 0L, 0L, 1L, 5L),
      (1L, 5L, 5L, 1000L, 6L, 10L)))
  }

  test("five bins over ten uniform margins hold two docs each") {
    val scored = (1L to 10L).map(m => (m, m, false))
      .toDF("doc_id", "margin_bits", "pos")
    val out = QualityClassifier.calibrationBins(scored, col("pos"), nBins = 5)
      .select("bin", "n_docs").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
  }

  test("NB margins on the fixture produce a monotone-ish reliability table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val scored = QualityClassifier
      .score(docs, "doc_id", "text", isPositive = col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val out = QualityClassifier.calibrationBins(scored, col("lang") === "en")
      .select("bin", "n_docs", "pos_permille")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).sum === docs.count())
    // top decile must carry a higher positive rate than the bottom decile
    assert(out.last._3 >= out.head._3,
      s"classifier anti-calibrated on its own training set: ${out.toSeq}")
  }
}
