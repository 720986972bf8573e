package graft.relational

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("group sizes below each k are flagged with exact permille") {
    // QI groups: a ×1, b ×3, c ×5 (9 rows). k=2 risks a (1 row, 111‰);
    // k=5 risks a+b (4 rows, 444‰); k=10 risks everything (1000‰).
    val rows = (Seq.fill(1)("a") ++ Seq.fill(3)("b") ++ Seq.fill(5)("c"))
      .toDF("qi")
    val out = Privacy.kAnonymity(rows, Seq("qi"), Seq(2, 5, 10))
      .orderBy("k")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 3L, 1L, 1L, 111L), (5L, 3L, 2L, 4L, 444L),
      (10L, 3L, 3L, 9L, 1000L)))
  }

  test("NULL quasi-identifiers form a linkable group of their own") {
    val rows = Seq(Some("x"), None, None).toDF("qi")
    val out = Privacy.kAnonymity(rows, Seq("qi"), Seq(2))
      .as[(Long, Long, Long, Long, Long)].collect().head
    // the two NULL rows are one size-2 group — only "x" is at risk
    assert(out === ((2L, 2L, 1L, 1L, 333L)))
  }

  test("misuse fails loudly") {
    val rows = Seq("a").toDF("qi")
    intercept[IllegalArgumentException] {
      Privacy.kAnonymity(rows, Seq.empty, Seq(2))
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymity(rows, Seq("qi"), Seq(1))
    }
  }

  test("l-diversity catches the homogeneous group k-anonymity passes") {
    // group g1: 3 rows, ONE sensitive value — k=2 safe, l=2 at risk;
    // group g2: 2 rows, two values — safe on both
    val rows = Seq(("g1", "flu"), ("g1", "flu"), ("g1", "flu"),
      ("g2", "flu"), ("g2", "cold")).toDF("qi", "dx")
    val kOut = Privacy.kAnonymity(rows, Seq("qi"), Seq(2))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(kOut._3 === 0L, "k-anonymity sees no risk here")
    val lOut = Privacy.lDiversity(rows, Seq("qi"), "dx", Seq(2))
      .as[(Long, Long, Long, Long, Long)].collect().head
    // (l, n_groups, groups_at_risk, rows_at_risk, permille)
    assert(lOut === ((2L, 2L, 1L, 3L, 600L)))
  }
}
