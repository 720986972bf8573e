package graft.dedup

import graft.SparkSpec

class CoverageSelectSpec extends SparkSpec {
  import spark.implicits._

  // 3-word shingles: doc text "a b c d" has shingles {a b c, b c d}
  private lazy val docs = Seq(
    (1L, "w1 w2 w3 w4 w5"),          // 3 shingles
    (2L, "w1 w2 w3"),                // 1 shingle, subset of doc 1
    (3L, "x1 x2 x3 x4"),             // 2 fresh shingles
    (4L, "w3 w4 w5 x9"))             // 2 shingles, 1 overlapping doc 1
    .toDF("doc_id", "text")

  test("greedy picks by marginal gain with id ties, totals accumulate") {
    val out = CoverageSelect.greedyCoverage(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // round 1: doc 1 (3 new); round 2: doc 3 (2 new) beats doc 4 (1 new:
    // "w3 w4 w5" already covered); round 3: doc 4 (1 new)
    assert(out === Seq(
      (1L, 1L, 3L, 3L),
      (2L, 3L, 2L, 5L),
      (3L, 4L, 1L, 6L)))
  }

  test("exhausted coverage fails loudly instead of emitting zero rounds") {
    val e = intercept[IllegalArgumentException](
      CoverageSelect.greedyCoverage(docs, "doc_id", "text", k = 5))
    assert(e.getMessage.contains("exhausted"))
  }

  test("k outside the pinned-round contract is refused") {
    intercept[IllegalArgumentException](
      CoverageSelect.greedyCoverage(docs, "doc_id", "text", k = 0))
  }
}
