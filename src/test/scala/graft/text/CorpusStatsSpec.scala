package graft.text

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("vocab growth: new terms land in their first-occurrence bucket") {
    // 4 docs, 2 buckets: doc 1-2 in bucket 1, 3-4 in bucket 2;
    // "b" first appears in doc 1 → bucket 1 even though doc 3 repeats it
    val d = Seq((1L, "a b"), (2L, "a c"), (3L, "b d"), (4L, "d e"))
      .toDF("doc_id", "text")
    val out = CorpusStats.vocabGrowth(d, "doc_id", "text", nBuckets = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 2L, 4L, 3L, 3L, 4L)))  // a, b, c new
    assert(out(1) === ((2L, 2L, 4L, 2L, 5L, 8L)))  // d, e new
  }

  test("cumulative vocab ends at the corpus distinct-term count") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = CorpusStats.vocabGrowth(d, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length === 10)
    val totalVocab = d.selectExpr("explode(split(text, ' ')) AS t")
      .distinct().count()
    assert(out.last._5 === totalVocab)
    // cumulatives are non-decreasing and growth increments match
    assert(out.map(_._5).toSeq === out.map(_._4).scanLeft(0L)(_ + _).drop(1))
  }

  test("burstiness: a concentrated term outranks an evenly spread one") {
    // "x" occurs 20 times in ONE doc (tf/df = 20); "y" once in each of 20
    // docs (tf/df = 1)
    val docs = ((1L, ("x " * 20).trim) +: (2L to 21L).map(i => (i, "y filler")))
      .toDF("doc_id", "text")
    val out = CorpusStats.burstiness(docs, "doc_id", "text", minTf = 20L, topK = 5)
      .select("term", "burst_permille").as[(String, Long)].collect()
    assert(out.head === (("x", 20000L)))
    assert(out.find(_._1 == "y").get._2 === 1000L)
  }

  test("zipf octaves: hand-checked curve and exact OLS slope") {
    // f(A)=8 → rank 1 (octave 0); f(B)=f(C)=4 → ranks 2-3 (octave 1);
    // f(D..G)=1 → ranks 4-7 (octave 2). mean bits per octave: 3000, 2000,
    // 0 millibits. OLS over (0,3000),(1,2000),(2,0): slope = -9000/6.
    val docs = Seq((1L, ("A " * 8 + "B " * 4 + "C " * 4 + "D E F G").trim))
      .toDF("doc_id", "text")
    val out = CorpusStats.zipfOctaves(docs, "text")
      .orderBy("octave")
      .select("octave", "n_terms", "total_count", "mean_freq_millibits",
        "slope")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3, r._4)) ===
      Seq((0L, 1L, 8L, 3000L), (1L, 2L, 8L, 2000L), (2L, 4L, 4L, 0L)))
    assert(out.forall(r => math.abs(r._5 - (-1500.0)) < 1e-9))
  }

  test("zipf octaves: a frequency class spanning octaves splits its block") {
    // f(A)=4 → rank 1. Five singleton terms occupy ranks 2-6: the ONE
    // class must contribute 2 terms to octave 1 (ranks 2-3) and 3 to
    // octave 2 (ranks 4-6) via block-overlap arithmetic.
    val docs = Seq((1L, "A A A A B C D E F")).toDF("doc_id", "text")
    val out = CorpusStats.zipfOctaves(docs, "text")
      .orderBy("octave").select("octave", "n_terms", "total_count")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 1L, 4L), (1L, 2L, 2L), (2L, 3L, 3L)))
  }

  test("vocab projection: hand-counted FoF, bias-corrected Chao1, GT mass") {
    // bigrams of "a b a b c" = (a b), (b a), (a b), (b c): V=3, N=4,
    // F1=2 (b a, b c), F2=1 (a b)
    // chao1 = 3 + 2*1/(2*2) = 3; unseen = 1000*2/4 = 500
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val r = CorpusStats.vocabProjection(docs, "text", gramN = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r === ((3L, 4L, 2L, 1L, 3L, 500L)))
  }

  test("vocab projection: closed vocabulary degenerates honestly (F1=0)") {
    // every bigram repeats: F1 = 0 → chao1 = V exactly, unseen mass 0
    val docs = Seq((1L, "x y x y x y x y x")).toDF("doc_id", "text")
    val r = CorpusStats.vocabProjection(docs, "text", gramN = 2)
      .select("vocab", "f1", "chao1_vocab_est", "unseen_mass_permille")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._2 === 0L)
    assert(r._3 === r._1)
    assert(r._4 === 0L)
  }
}
