package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // target domain: cooking text
    (1L, "stir the sauce then season the sauce with salt", true),
    (2L, "season the stew then stir the stew with care", true),
    // raw pool: one cooking-like doc, one off-domain doc of equal length
    (10L, "stir the sauce then season the stew with salt", false),
    (11L, "compile the kernel then link the binary with flags", false)
  ).toDF("id", "text", "tgt")

  test("raw docs resembling the target domain outscore off-domain docs") {
    val scores = Importance
      .importanceScores(docs, "id", "text", isTarget = col("tgt"), buckets = 256)
      .filter(!col("is_target"))
      .select(col("id"), col("score")).as[(Long, Long)].collect().toMap
    assert(scores(10L) > scores(11L),
      s"cooking-like doc must outscore off-domain doc: $scores")
  }

  test("scores are integer-deterministic across runs and bucket-bounded weights are positive") {
    val run1 = Importance.importanceScores(docs, "id", "text", col("tgt"))
      .orderBy("id").collect().toSeq
    val run2 = Importance.importanceScores(docs, "id", "text", col("tgt"))
      .orderBy("id").collect().toSeq
    assert(run1 === run2)
    val w = Importance.bucketWeights(
      Importance.bigramBuckets(docs, "id", "text", col("tgt"), 256),
      "__b", "__t", 1000000L)
    assert(w.filter(col("w") <= 0).isEmpty, "Laplace smoothing keeps weights positive")
  }

  test("n_bigrams equals tokens minus one per doc; one-word docs are absent") {
    val tiny = Seq((1L, "word", false), (2L, "two words", false),
      (3L, "a b c d", true)).toDF("id", "text", "tgt")
    val out = Importance.importanceScores(tiny, "id", "text", col("tgt"))
      .select(col("id"), col("n_bigrams")).as[(Long, Long)].collect().toMap
    assert(!out.contains(1L), "no bigram -> no row")
    assert(out(2L) === 1L)
    assert(out(3L) === 3L)
  }
}
