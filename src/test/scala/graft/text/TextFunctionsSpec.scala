package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "el perro la casa de que es"),
    (3L, "xyz qqq zzz")).toDF("id", "text")

  test("token stats") {
    val got = df.select(col("id"),
      TextFunctions.tokenCount(col("text")),
      TextFunctions.distinctTokenCount(col("text")),
      TextFunctions.stopwordCount(col("text"), Seq("the", "a")))
      .as[(Long, Int, Int, Int)].collect()
      .map { case (a, b, c, d) => a -> ((b, c, d)) }.toMap
    assert(got(1L) === ((6, 5, 2)))
    assert(got(3L) === ((3, 3, 0)))
  }

  test("language-ID heuristic picks marker-dominant language") {
    val got = df.select(col("id"), TextFunctions.langId(col("text")))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "en")
    assert(got(2L) === "es")
    assert(got(3L) === "und")
  }

  test("shingles produce n-grams; short docs produce none") {
    val sh = df.select(col("id"), TextFunctions.shingles(col("text"), 3))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).head === "the cat sat")
    assert(sh(1L).size === 4)
    assert(sh(3L).size === 1)
    val short = Seq((9L, "one two")).toDF("id", "text")
      .select(TextFunctions.shingles(col("text"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("bag fingerprint is order-insensitive, content-sensitive") {
    val fps = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"),
      (3L, "alpha beta delta")).toDF("id", "text")
      .select(col("id"), TextFunctions.bagFingerprint(col("text")))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("BPE-ish tokenizer splits on letter/digit/punct boundaries") {
    val got = Seq((1L, "foo-bar123 baz! x")).toDF("id", "text")
      .select(TextFunctions.bpeishTokens(col("text"))).as[Seq[String]].head()
    assert(got === Seq("foo", "-", "bar", "123", " ", "baz", "!", " ", "x"))
  }

  test("approximate distinct is within 5% of exact on the fixture") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val (approx, exact) = ev.agg(
      approx_count_distinct(col("user_id")),
      countDistinct(col("user_id"))).as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("quality score is in [0,1] and penalizes degenerate docs") {
    val q = Seq((1L, ("word " * 200).trim), (2L, "the the the the the"))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.qualityScore(col("text"), Seq("the", "a")))
      .as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(2L) < q(1L), "stopword-only doc must score lower")
  }

  test("token rarity ranks: frequency-desc unique ranks, text tie-break") {
    // counts: c=3, b=2, a=1 -> ranks c=1, b=2, a=3
    val d = Seq((1L, "b b a c c"), (2L, "c")).toDF("doc_id", "text")
    val sums = TextFunctions.tokenRarityRanks(d, "doc_id", "text")
      .groupBy("doc_id").agg(sum("rank").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sums === Map(1L -> 9L, 2L -> 1L)) // 2+2+3+1+1 and 1
    // tie-break: equal counts rank by token text ascending
    val tie = Seq((1L, "x y")).toDF("doc_id", "text")
    val ranks = TextFunctions.tokenRarityRanks(tie, "doc_id", "text")
      .select("rank").as[Int].collect().toSeq.sorted
    assert(ranks === Seq(1, 2))
  }

  test("normalizedForm folds case/punctuation/spacing; fingerprint groups variants") {
    val d = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "hello worlds"),           // different content — must NOT merge
      (5L, "a-b c_d"),                // punctuation becomes separators
      (6L, "a b c d")
    ).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
      TextFunctions.normalizedForm(col("text")).as("norm"),
      TextFunctions.normalizedFingerprint(col("text")).as("fp"))
      .as[(Long, String, String)].collect().toList
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(byId(1L) === "hello world")
    assert(byId(2L) === "hello world")
    assert(byId(3L) === "hello world")
    assert(byId(5L) === "a b c d")
    val fps = out.map(t => t._1 -> t._3).toMap
    assert(fps(1L) === fps(2L) && fps(2L) === fps(3L))
    assert(fps(1L) !== fps(4L))
    assert(fps(5L) === fps(6L))
  }
}
