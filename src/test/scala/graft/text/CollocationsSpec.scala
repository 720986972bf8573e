package graft.text

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed PMI lift ranks the glued pair above the chance pair") {
    // corpus: "a b" ×6 (a only before b), "c d" ×6, plus "a d" ×3 — the
    // cross pair occurs but less than independence-proportional
    val docs = (Seq.fill(6)("a b") ++ Seq.fill(6)("c d") ++ Seq.fill(3)("a d"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Collocations.pmiTopPairs(docs, "doc_id", "text",
      minCount = 3L, topK = 10)
      .select("x", "y", "c_xy", "lift_permille")
      .as[(String, String, Long, Long)].collect()
    val lifts = out.map(r => (r._1, r._2) -> r._4).toMap
    // T_u = 30, T_b = 15; c_a = 9, c_b = 6, c_d = 9
    // lift(a,b) = 1000·6·900/(15·9·6) = 6666; lift(a,d) = 1000·3·900/(15·9·9) = 2222
    assert(lifts(("a", "b")) === 6666L)
    assert(lifts(("a", "d")) === 2222L)
    assert(out.head._1 === "a" && out.head._2 === "b")
  }

  test("support floor drops one-off co-occurrences; fixture top-k is full") {
    val docs = Seq((1L, "p q"), (2L, "p q"), (3L, "r s"))
      .toDF("doc_id", "text")
    val out = Collocations.pmiTopPairs(docs, "doc_id", "text",
      minCount = 2L, topK = 10)
      .select("x", "y").as[(String, String)].collect()
    assert(out.toSeq === Seq(("p", "q")))
    val fix = spark.read.parquet(s"$sf0001/documents.parquet")
    val top = Collocations.pmiTopPairs(fix, "doc_id", "text", 5L, 20)
    assert(top.count() === 20L)
  }
}
