package graft.text

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized parity for the row-local Gopher folds: the Spark
  * higher-order-function signals must match a plain sequential Scala
  * computation over the same token list (the fold shape — max sorted run,
  * array_distinct — is exactly the part worth fuzzing).
  */
class GopherParitySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], trials: Int): Seq[A] =
    (1 to trials).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  test("repetition signals match a sequential reference on random token lists") {
    val docGen = for {
      n <- Gen.chooseNum(3, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "b", "ccc", "dd", "e"))
    } yield toks
    samples(docGen, 10).zipWithIndex.foreach { case (toks, i) =>
      val text = toks.mkString(" ")
      val got = GopherRules.repetitionSignals(
        Seq((i.toLong, text)).toDF("doc_id", "text"), "text")
        .select("n_words", "n_word_chars", "mean_word_len_centi",
          "ttr_permille", "top_bigram_permille", "dup_trigram_permille")
        .as[(Long, Long, Long, Long, Long, Long)].head()

      val n = toks.length.toLong
      val chars = toks.map(_.length.toLong).sum
      val bigrams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toList
      val trigrams = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toList
      val topBg = if (bigrams.isEmpty) 0L
        else bigrams.groupBy(identity).values.map(_.length).max.toLong
      val expect = (
        n, chars, 100L * chars / n,
        1000L * toks.distinct.length / n,
        if (bigrams.isEmpty) 0L else 1000L * topBg / bigrams.length,
        if (trigrams.isEmpty) 0L
        else 1000L * (trigrams.length - trigrams.distinct.length) / trigrams.length)
      assert(got === expect, s"tokens: $toks")
    }
  }
}
