package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def sig(text: String) =
    GopherRules.repetitionSignals(
      Seq((1L, text)).toDF("doc_id", "text"), "text")
      .select("n_words", "mean_word_len_centi", "ttr_permille",
        "top_bigram_permille", "dup_trigram_permille")
      .as[(Long, Long, Long, Long, Long)].head()

  test("degenerate all-same doc: top bigram and dup trigram saturate") {
    // "a a a a a": 5 words, 5 chars, 4 identical bigrams, 3 identical trigrams
    assert(sig("a a a a a") === ((5L, 100L, 200L, 1000L, 666L)))
  }

  test("all-distinct doc: ttr 1000, no repetition") {
    // "ab cd ef gh": 4 words, 8 chars → mean 200; 3 distinct bigrams, 2 trigrams
    assert(sig("ab cd ef gh") === ((4L, 200L, 1000L, 333L, 0L)))
  }

  test("alternating doc: max sorted-run counts the mode bigram") {
    // "b c b c b": bigrams [b c, c b, b c, c b] → top 2/4 = 500;
    // trigrams [b c b, c b c, b c b] → 3 total, 2 distinct → dup 333
    assert(sig("b c b c b") === ((5L, 100L, 400L, 500L, 333L)))
  }

  test("keep gate: repetitive docs drop, healthy docs keep") {
    val docs = Seq(
      (1L, Seq.fill(30)("spam").mkString(" ")),               // saturated repetition
      (2L, (1 to 30).map(i => s"tok$i").mkString(" "))        // fully distinct
    ).toDF("doc_id", "text")
    val out = GopherRules.repetitionSignals(docs, "text")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(!out(1L) && out(2L))
  }

  test("short doc below minWords drops regardless of diversity") {
    val docs = Seq((1L, "unique tokens only here")).toDF("doc_id", "text")
    val out = GopherRules.repetitionSignals(docs, "text")
      .select("keep").as[Boolean].head()
    assert(!out)
  }
}
