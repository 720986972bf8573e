package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f"),        // segments (w=3): "a b c", "d e f"
    (2L, "a b c x y z"),        // shares "a b c"
    (3L, "a b c q"),            // shares "a b c"; short tail segment "q"
    (4L, "u v w")               // unique
  ).toDF("doc_id", "text")

  test("segments rebuild word order and count the short tail") {
    val segs = LineDedup.segments(docs, "doc_id", "text", 3)
      .orderBy("doc_id", "seg")
      .select("doc_id", "seg", "seg_text", "n_words")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(segs === Seq(
      (1L, 0L, "a b c", 3L), (1L, 1L, "d e f", 3L),
      (2L, 0L, "a b c", 3L), (2L, 1L, "x y z", 3L),
      (3L, 0L, "a b c", 3L), (3L, 1L, "q", 1L),
      (4L, 0L, "u v w", 3L)))
  }

  test("dedupStats drops exactly the segments over the doc-frequency cap") {
    // "a b c" appears in 3 docs > maxDocs=2 -> dropped everywhere
    val stats = LineDedup.dedupStats(docs, "doc_id", "text", 3, 2)
      .orderBy("doc_id")
      .select("doc_id", "n_seg", "kept_seg", "dropped_seg", "kept_words")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(stats === Seq(
      (1L, 2L, 1L, 1L, 3L),
      (2L, 2L, 1L, 1L, 3L),
      (3L, 2L, 1L, 1L, 1L),
      (4L, 1L, 1L, 0L, 3L)))
  }

  test("cleanDocs rejoins surviving segments in order") {
    val cleaned = LineDedup.cleanDocs(docs, "doc_id", "text", 3, 2)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(cleaned === Seq(
      (1L, "d e f"), (2L, "x y z"), (3L, "q"), (4L, "u v w")))
  }

  test("cleanDocs drops documents whose every segment is boilerplate") {
    val d = Seq((1L, "x y z"), (2L, "x y z"), (3L, "x y z"), (4L, "k l m"))
      .toDF("doc_id", "text")
    val out = LineDedup.cleanDocs(d, "doc_id", "text", 3, 2)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out === Seq((4L, "k l m")))
  }

  test("stats are invariant to input partitioning") {
    val one = LineDedup.dedupStats(docs.repartition(1), "doc_id", "text", 3, 2)
      .orderBy("doc_id").collect().toSeq
    val many = LineDedup.dedupStats(docs.repartition(7), "doc_id", "text", 3, 2)
      .orderBy("doc_id").collect().toSeq
    assert(one === many)
  }

  test("within-doc dedup keeps first occurrences and counts saved words exactly") {
    val docs = Seq(
      (1L, "a b c a b c d"),      // segs: [a b c][a b c][d] → 1 dup, 3 saved
      (2L, "p q r s t u"),        // no repeats
      (3L, "z"),                  // single short segment
      (4L, "m n o m n o m n o")   // 2 dups, 6 saved
    ).toDF("doc_id", "text")
    val got = LineDedup.withinDocDedupStats(docs, "doc_id", "text", 3)
      .orderBy(col("doc_id"))
      .as[(Long, Int, Int, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 3, 2, 1L, 7L, 3L),
      (2L, 2, 2, 0L, 6L, 0L),
      (3L, 1, 1, 0L, 1L, 0L),
      (4L, 3, 1, 2L, 9L, 6L)))
  }
}
