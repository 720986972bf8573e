package graft.relational

import graft.SparkSpec

class FrequentPairsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked supports and exact permille lifts") {
    // b1:{A,B} b2:{A,B} b3:{A,C} → c(A)=3 c(B)=2 c(C)=1, 3 baskets.
    // (A,B): support 2, lift = 1000·2·3 div (3·2) = 1000
    // (A,C): support 1, lift = 1000·1·3 div (3·1) = 1000
    val rows = Seq(("b1", "A"), ("b1", "B"), ("b2", "A"), ("b2", "B"),
      ("b3", "A"), ("b3", "C")).toDF("basket", "item")
    val out = FrequentPairs.mine(rows, "basket", "item", 1L, 1L)
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out === Seq(("A", "B", 2L, 1000L), ("A", "C", 1L, 1000L)))
  }

  test("the A-Priori item floor cuts pairs before the self-join") {
    // C appears in only 1 basket: with minItemSupport=2 the (A,C) pair
    // never reaches the join, even though minPairSupport=1 would admit it.
    val rows = Seq(("b1", "A"), ("b1", "B"), ("b2", "A"), ("b2", "B"),
      ("b3", "A"), ("b3", "C")).toDF("basket", "item")
    val out = FrequentPairs.mine(rows, "basket", "item", 2L, 1L)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out === Seq(("A", "B", 2L, 1000L)))
  }

  test("duplicate (basket, item) rows collapse before counting") {
    val rows = Seq(("b1", "A"), ("b1", "A"), ("b1", "B"), ("b2", "A"),
      ("b2", "B")).toDF("basket", "item")
    val out = FrequentPairs.mine(rows, "basket", "item", 1L, 1L)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out === Seq(("A", "B", 2L, 1000L)))
  }

  test("a quadratic-blowup basket fails loudly; empty input returns empty") {
    val big = (1 to 30).map(i => ("huge", s"i$i")).toDF("basket", "item")
    val e = intercept[IllegalArgumentException] {
      FrequentPairs.mine(big, "basket", "item", 1L, 1L, maxBasketSize = 10)
    }
    assert(e.getMessage.contains("O(k²)"))
    val empty = Seq.empty[(String, String)].toDF("basket", "item")
    val out = FrequentPairs.mine(empty, "basket", "item", 1L, 1L)
    assert(out.count() === 0L)
    assert(out.columns.toSeq ===
      Seq("item_a", "item_b", "support", "lift_permille"))
  }

  test("rule strengths: hand-checked confidence, lift, cosine², jaccard") {
    // same fixture as the lift test: c(A)=3 c(B)=2 c(C)=1, 3 baskets
    // A→B conf 2000 div 3=666, B→A 1000; cos²(A,B)=4e6 div 6=666666,
    // jac(A,B)=2000 div 3=666; A→C 333 / C→A 1000, cos²=333333, jac=333
    val rows = Seq(("b1", "A"), ("b1", "B"), ("b2", "A"), ("b2", "B"),
      ("b3", "A"), ("b3", "C")).toDF("basket", "item")
    val out = FrequentPairs.ruleStrengths(rows, "basket", "item", 1L, 1L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("A", "B", 2L, 666L, 1000L, 666666L, 666L),
      ("A", "C", 1L, 333L, 1000L, 333333L, 333L),
      ("B", "A", 2L, 1000L, 1000L, 666666L, 666L),
      ("C", "A", 1L, 1000L, 1000L, 333333L, 333L)))
  }
}
