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

  test("t-closeness catches the skewed group l-diversity passes") {
    // global: 5 flu, 5 cold (N=10). Group g1: 4 flu, 1 cold — l=2 diverse
    // (both values present) yet heavily skewed vs the 50/50 global.
    // TVD(g1) = |4/5 - 1/2| + |1/5 - 1/2| over 2 = 0.3 -> 300 permille.
    // Group g2: 1 flu, 4 cold — mirror image, also 300.
    val rows = Seq(("g1", "flu"), ("g1", "flu"), ("g1", "flu"), ("g1", "flu"),
      ("g1", "cold"), ("g2", "flu"), ("g2", "cold"), ("g2", "cold"),
      ("g2", "cold"), ("g2", "cold")).toDF("qi", "dx")
    val lOut = Privacy.lDiversity(rows, Seq("qi"), "dx", Seq(2))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(lOut._3 === 0L, "l-diversity sees no risk here")
    val tOut = Privacy.tCloseness(rows, Seq("qi"), "dx", Seq(200, 300))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // t=200: both groups at TVD 300 > 200 -> all rows at risk
    assert(tOut(0) === ((200L, 2L, 2L, 10L, 1000L)))
    // t=300: 300 > 300 is false -> none at risk (closeness is <= t)
    assert(tOut(1) === ((300L, 2L, 0L, 0L, 0L)))
  }

  test("t-closeness absent-value folding is exact") {
    // group g1 MISSES value 'c' entirely: global 2a 2b 2c (N=6),
    // g1 = {a, b} (ng=2): per-value |c*N - C*ng|: a: |1*6-2*2|=2,
    // b: 2, absent c contributes C_c*ng = 4 -> sum 8;
    // tvd = 1000*8 / (2*2*6) = 333. g2 = {a, b, c, c} (ng=4):
    // a: |6-8|=2, b: 2, c: |12-8|=4 -> 8; tvd = 1000*8/(2*4*6) = 166.
    val rows = Seq(("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"),
      ("g2", "c"), ("g2", "c")).toDF("qi", "dx")
    val out = Privacy.tCloseness(rows, Seq("qi"), "dx", Seq(200))
      .as[(Long, Long, Long, Long, Long)].collect().head
    // only g1 (tvd 333) exceeds 200; its 2 rows of 6 at risk
    assert(out === ((200L, 2L, 1L, 2L, 333L)))
  }

  test("DP contribution bound: clamp tradeoff counts replay by hand") {
    // u1: cells (a:3, b:1) — total 4, max 3; u2: (a:1) — total 1, max 1.
    // cap=2: u1 clamped (3>2), lost 1, kept min(3,2)+1=3; u2 kept 1.
    // summary: units 2, clamped 1, rows_lost 1 of 5 -> 200 permille,
    // l1_after = max(3, 1) = 3.
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"))
      .toDF("u", "cell")
    val out = Privacy.contributionBound(rows, "u", Seq("cell"), Seq(2))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(out === ((2L, 2L, 1L, 1L, 200L, 3L)))
    // cap=3: nothing clamped, sensitivity is the raw max total 4
    val out3 = Privacy.contributionBound(rows, "u", Seq("cell"), Seq(3))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(out3 === ((3L, 2L, 0L, 0L, 0L, 4L)))
  }

  test("t-closeness refuses an unbounded sensitive domain loudly") {
    val rows = (1 to 50).map(i => ("g", s"v$i")).toDF("qi", "dx")
    val e = intercept[IllegalArgumentException] {
      Privacy.tCloseness(rows, Seq("qi"), "dx", Seq(200), maxDomain = 10)
    }
    assert(e.getMessage.contains("domain"))
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
