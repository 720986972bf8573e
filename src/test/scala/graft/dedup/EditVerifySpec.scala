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

  test("cluster cohesion flags transitive chains via the min similarity") {
    // One component of 3 docs where 1≈2 and 2≈3 but 1 vs 3 drifted: the
    // min column carries the verdict while the mean still looks healthy.
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("id", "comp")
    val docs = Seq(
      (1L, "aaaaaaaaaa"), (2L, "aaaaaaaabb"), (3L, "aaaaaabbbb"),
      (9L, "unrelated"))
      .toDF("doc_id", "text")
    val out = EditVerify.clusterCohesion(labels, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // pairs: (1,2) dist 2 → 800, (1,3) dist 4 → 600, (2,3) dist 2 → 800
    assert(out === Seq((1L, 3L, 3L, 600L, 733L)))
  }

  test("a giant cluster fails loudly instead of joining quadratically") {
    val labels = (1L to 5L).map(i => (i, 1L)).toDF("id", "comp")
    val docs = (1L to 5L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      EditVerify.clusterCohesion(labels, docs, "doc_id", "text",
        maxClusterSize = 3)
    }
    assert(e.getMessage.contains("maxClusterSize"))
  }
}
