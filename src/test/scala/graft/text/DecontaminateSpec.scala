package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val evalText = (1 to 8).map(i => s"w$i").mkString(" ") // exactly one 8-gram

  test("train doc sharing the eval 8-gram is flagged; disjoint doc is clean") {
    val docs = Seq(
      (7L, evalText),                                     // eval (id % 10 == 7)
      (1L, s"prefix $evalText suffix"),                   // 3 grams, 1 hit
      (2L, (1 to 12).map(i => s"z$i").mkString(" "))      // 5 grams, 0 hits
    ).toDF("doc_id", "text")
    val out = Decontaminate.report(docs, "doc_id", "text", 8,
      col("doc_id") % 10 === 7, flagPermille = 200)
      .select("doc_id", "n_grams", "n_hit", "contam_permille", "contaminated")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out === Array(
      (1L, 3L, 1L, 333L, true),
      (2L, 5L, 0L, 0L, false)))
  }

  test("eval docs are excluded from the report") {
    val docs = Seq((7L, evalText), (17L, evalText), (1L, evalText))
      .toDF("doc_id", "text")
    val ids = Decontaminate.report(docs, "doc_id", "text", 8,
      col("doc_id") % 10 === 7).select("doc_id").as[Long].collect()
    assert(ids.toSeq === Seq(1L))
  }

  test("train doc shorter than k reports zeros, not a dropped row") {
    val docs = Seq((7L, evalText), (3L, "too short")).toDF("doc_id", "text")
    val out = Decontaminate.report(docs, "doc_id", "text", 8,
      col("doc_id") % 10 === 7)
      .select("doc_id", "n_grams", "n_hit", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out === Array((3L, 0L, 0L, false)))
  }

  test("duplicate grams within one doc count once (distinct fingerprints)") {
    val rep = (evalText + " ") * 2 + evalText // eval gram many times over
    val docs = Seq((7L, evalText), (4L, rep)).toDF("doc_id", "text")
    val out = Decontaminate.report(docs, "doc_id", "text", 8,
      col("doc_id") % 10 === 7)
      .select("n_grams", "n_hit").as[(Long, Long)].head()
    // 26 tokens → 19 positional grams but ≤19 DISTINCT; the eval 8-gram
    // counts once in n_hit no matter how often it recurs
    assert(out._2 >= 1L && out._2 < 19L && out._1 < 19L)
  }
}
