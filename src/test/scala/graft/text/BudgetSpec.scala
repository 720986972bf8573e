package graft.text

import graft.SparkSpec

class BudgetSpec extends SparkSpec {
  import spark.implicits._

  private def ps(rows: (String, Long, Long)*) =
    rows.toDF("source", "n_tokens", "q")

  private def run(budget: Long, rows: (String, Long, Long)*) =
    Budget.waterFill(ps(rows: _*), "source", "n_tokens", "q", budget)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().sortBy(_._4)

  test("fills in quality order; boundary source gets the remainder") {
    val out = run(250L, ("low", 100L, 100L), ("hi", 200L, 900L), ("mid", 100L, 500L))
    assert(out.toSeq === Seq(
      ("hi", 200L, 900L, 1L, 200L, true),
      ("mid", 100L, 500L, 2L, 50L, false),
      ("low", 100L, 100L, 3L, 0L, false)))
  }

  test("quality ties break on source name, both engines' ASCII order") {
    val out = run(150L, ("b", 100L, 500L), ("a", 100L, 500L))
    assert(out.map(r => (r._1, r._5)).toSeq === Seq(("a", 100L), ("b", 50L)))
  }

  test("budget >= corpus takes everything; zero budget takes nothing") {
    val all = run(1000L, ("x", 10L, 1L), ("y", 20L, 2L))
    assert(all.forall(_._6))
    val none = run(0L, ("x", 10L, 1L))
    assert(none.head._5 === 0L && !none.head._6)
  }

  test("a per-document frame fails the bounded-collect guard loudly") {
    val docs = (1L to 40L).map(i => (s"doc_$i", i, 500L))
    val e = intercept[IllegalArgumentException] {
      Budget.waterFill(ps(docs: _*), "source", "n_tokens", "q",
        budget = 100L, maxSources = 10)
    }
    assert(e.getMessage.contains("PER-SOURCE"))
  }
}
