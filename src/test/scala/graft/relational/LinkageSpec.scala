package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // 4 records, one block; field f1 has values (x,x,y,y) and f2 (p,q,p,q).
  private def recs = Seq(
    (1L, "b", "x", "p"), (2L, "b", "x", "q"),
    (3L, "b", "y", "p"), (4L, "b", "y", "q"))
    .toDF("rid", "blk", "f1", "f2")

  test("u is the exact frequency-based permille and the ratio is rational") {
    // u(f1) = u(f2) = (1000·(2²+2²)) div 16 = 500‰. m = 950‰.
    // Pair (1,2): agree on f1 only → num = 950·50, den = 500·500,
    // ratio = 1000·47500 div 250000 = 190.
    val out = Linkage.scorePairs(recs, "rid", Seq("blk"), Seq("f1", "f2"))
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .select("agree_f1", "agree_f2", "score_num", "score_den",
        "ratio_permille")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out === ((1L, 0L, 950L * 50L, 500L * 500L, 190L)))
  }

  test("all six in-block pairs emerge, none twice, ids ordered") {
    val out = Linkage.scorePairs(recs, "rid", Seq("blk"), Seq("f1"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
  }

  test("a full-agreement pair dominates a full-disagreement pair") {
    val df = Seq((1L, "b", "x"), (2L, "b", "x"), (3L, "b", "z"))
      .toDF("rid", "blk", "f1")
    val m = Linkage.scorePairs(df, "rid", Seq("blk"), Seq("f1"))
      .select("id_a", "id_b", "ratio_permille")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(m((1L, 2L)) > m((1L, 3L)))
  }

  test("a hot block is refused, not paired") {
    val big = (1L to 10L).map(i => (i, "b", "x")).toDF("rid", "blk", "f1")
    val e = intercept[IllegalArgumentException] {
      Linkage.scorePairs(big, "rid", Seq("blk"), Seq("f1"), maxBlock = 5)
    }
    assert(e.getMessage.contains("hottest block"))
  }

  test("block set colliding with a field set dedups to one grouping set") {
    // blockCols == Seq(f1): the block set and f1's field set are ONE
    // grouping set. Before the r13 dedup, Expand emitted each row once per
    // duplicate set and the shared gid's counts doubled — u(f1) inflated
    // from 500‰ to clamp(2000)=999‰ silently. Pair (1,2) is blocked on f1,
    // agrees on f1, disagrees on f2: den must read 500·500.
    val out = Linkage.scorePairs(recs, "rid", Seq("f1"), Seq("f1", "f2"))
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .select("score_num", "score_den", "ratio_permille")
      .as[(Long, Long, Long)].collect().head
    assert(out === ((950L * 50L, 500L * 500L, 190L)))
  }

  test("duplicate comparison fields are refused loudly") {
    val e = intercept[IllegalArgumentException] {
      Linkage.scorePairs(recs, "rid", Seq("blk"), Seq("f1", "f1"))
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("more than six comparison fields is refused (int64 product bound)") {
    val df = Seq((1L, "b", "x")).toDF("rid", "blk", "f1")
    intercept[IllegalArgumentException] {
      Linkage.scorePairs(df, "rid", Seq("blk"), Seq.fill(7)("f1"))
    }
  }
}
