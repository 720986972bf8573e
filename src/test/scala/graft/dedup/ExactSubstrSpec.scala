package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  // k=3 throughout: doc 1 and doc 2 share the 4-token run "a b c d";
  // doc 3 repeats "p q r" within itself; doc 4 shares nothing.
  private val docs = Seq(
    (1L, "a b c d e f"),
    (2L, "x y a b c d z"),
    (3L, "p q r s p q r"),
    (4L, "u v w n m")
  ).toDF("doc_id", "text")

  test("duplicatedSpans finds cross-doc shared runs as single merged spans") {
    val sp = ExactSubstr.duplicatedSpans(docs, "doc_id", "text", 3)
      .filter(col("doc_id").isin(1L, 2L))
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // "a b c d" = anchors {0,1} in doc 1 (span tokens 0..3) and {2,3} in
    // doc 2 (span tokens 2..5); consecutive anchors merge into ONE span
    assert(sp === Seq((1L, 0L, 3L, 2L), (2L, 2L, 5L, 2L)))
  }

  test("same-doc repeats count as duplication and split at gap >= k") {
    val sp = ExactSubstr.duplicatedSpans(docs, "doc_id", "text", 3)
      .filter(col("doc_id") === 3L)
      .orderBy("span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // "p q r" at positions 0 and 4: gap 4 >= 3 -> two disjoint spans
    assert(sp === Seq((3L, 0L, 2L, 1L), (3L, 4L, 6L, 1L)))
  }

  test("docCoverage zero-fills clean docs and reports exact union coverage") {
    val cov = ExactSubstr.docCoverage(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "total_tokens", "n_spans", "covered_tokens", "dup_permille")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(cov === Seq(
      (1L, 6L, 1L, 4L, 666L),
      (2L, 7L, 1L, 4L, 571L),
      (3L, 7L, 2L, 6L, 857L),
      (4L, 5L, 0L, 0L, 0L)))
  }

  test("anchors emit one fingerprint per full window and agree on equal text") {
    val a = ExactSubstr.anchors(docs, "doc_id", "text", 3)
    // doc 4 has 5 tokens -> 3 full windows
    assert(a.filter(col("doc_id") === 4L).count() === 3L)
    // the shared run's first anchor hashes identically across docs
    val fp1 = a.filter(col("doc_id") === 1L && col("pos") === 0).select("fp").as[String].head()
    val fp2 = a.filter(col("doc_id") === 2L && col("pos") === 2).select("fp").as[String].head()
    assert(fp1 === fp2)
  }
}
