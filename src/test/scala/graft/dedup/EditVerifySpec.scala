package graft.dedup

import graft.SparkSpec

class EditVerifySpec extends SparkSpec {
  import spark.implicits._

  test("prefix-blocked pairs score exact Levenshtein permille") {
    val docs = Seq(
      (1L, "abcd hello world"),
      (2L, "abcd hello wurld"), // 1 edit from doc 1, same block
      (3L, "zzzz unrelated text")) // different block → no pair
      .toDF("doc_id", "text")
    val out = EditVerify.blockedEditSimilarity(docs, "doc_id", "text",
      blockPrefix = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // max_len 16, dist 1 → sim = 1000·15 div 16 = 937
    assert(out === Seq((1L, 2L, 1L, 16L, 937L)))
  }

  test("verification stops at the window: differences beyond it are unseen") {
    val docs = Seq((1L, "abcdXXXX----1"), (2L, "abcdXXXX----2"))
      .toDF("doc_id", "text")
    val out = EditVerify.blockedEditSimilarity(docs, "doc_id", "text",
      blockPrefix = 4, verifyWindow = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 0L, 8L, 1000L)))
  }

  test("a hot block fails loudly instead of exploding quadratically") {
    val docs = (1L to 5L).map(i => (i, s"same prefix doc $i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      EditVerify.blockedEditSimilarity(docs, "doc_id", "text",
        blockPrefix = 11, maxBlockSize = 3).collect()
    }
    assert(e.getMessage.contains("maxBlockSize"))
  }
}
