package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("per-doc word/syllable/mono counts on hand-counted text") {
    // "the table scans beautifully": the(1 group: e) table(2: a,e) scans(1: a)
    // beautifully(4: eau, i, u, y) → words 4, syllables 8, mono 2
    val df = Seq((1L, "the table scans beautifully")).toDF("id", "text")
    val row = Readability.perDoc(df, "text")
      .select("n_words", "n_syllables", "n_mono")
      .as[(Long, Long, Long)].collect().head
    assert(row === ((4L, 8L, 2L)))
  }

  test("profile formula: FORCAST milli-grade from corpus-level ratios") {
    // two docs, one group: 6 words, 4 mono → grade = 20000 - 15000*4/6
    val df = Seq(("s", "cat dog run fast"), ("s", "elephant is"))
      .toDF("source", "text")
    val r = Readability.profile(df, "text", Seq("source"))
      .select("n_docs", "n_words", "mono_permille", "forcast_grade_milli")
      .as[(Long, Long, Long, Long)].collect().head
    // cat dog run fast = 4 mono; elephant(3 groups: e,e,a) is(1) → 1 mono
    assert(r._1 === 2L && r._2 === 6L)
    assert(r._3 === 1000L * 5 / 6)
    assert(r._4 === 20000L - 15000L * 5 / 6)
  }

  test("vowel-less words count zero syllables, never negative") {
    val df = Seq((1L, "hm pfft xyz")).toDF("id", "text")
    val row = Readability.perDoc(df, "text")
      .select("n_syllables", "n_mono").as[(Long, Long)].collect().head
    assert(row._1 === 1L) // only the y in xyz
    assert(row._2 === 1L)
  }
}
