package graft.text

import graft.SparkSpec

class EntropySpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    Entropy.unigramEntropy(texts.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("hand-computed integer-bits entropy") {
    // doc 1: "a a a a" → n=4, c=4 → bits(4 div 4)=0 → H=0 (pure repetition)
    // doc 2: "a b c d" → n=4, c=1 each → bits(4)=2 → H=4·2=8, 2000 mb/token
    // doc 3: "a a b b" → c=2 → bits(2)=1 → H=4·1=4, 1000 mb/token
    val out = run(1L -> "a a a a", 2L -> "a b c d", 3L -> "a a b b")
    assert(out(1L) === ((4L, 1L, 0L, 0L)))
    assert(out(2L) === ((4L, 4L, 8L, 2000L)))
    assert(out(3L) === ((4L, 2L, 4L, 1000L)))
  }

  test("repetition scores strictly below diversity at equal length") {
    val out = run(1L -> "x y x y x y x y", 2L -> "a b c d e f g h")
    assert(out(1L)._4 < out(2L)._4)
  }

  test("fixture: entropy bounded by log2(n) per token") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = Entropy.unigramEntropy(d, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === d.count())
    out.foreach { case (id, n, nd, h, mbt) =>
      assert(nd <= n)
      val maxBits = 64 - java.lang.Long.numberOfLeadingZeros(n)
      assert(mbt >= 0 && mbt <= 1000L * maxBits, s"doc $id: $mbt vs n=$n")
    }
  }
}
