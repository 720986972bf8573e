package graft.relational

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def run(evs: (Long, String, Long)*) =
    Funnel.conversion(evs.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", stages)
      .select("stage_idx", "stage", "n_users", "conv_permille")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)

  test("order matters: stages must complete in sequence") {
    val out = run(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L), // full path
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 3L), // click BEFORE view
      (3L, "view", 1L), (3L, "purchase", 2L),                    // skips click
      (4L, "purchase", 1L), (4L, "click", 2L), (4L, "view", 3L)) // reversed
    assert(out.toSeq === Seq(
      (1L, "view", 4L, 1000L),
      (2L, "click", 1L, 250L),
      (3L, "purchase", 1L, 250L)))
  }

  test("same-timestamp stage completion counts (inclusive frontier)") {
    val out = run((1L, "view", 5L), (1L, "click", 5L), (1L, "purchase", 5L))
    assert(out.map(_._3).toSeq === Seq(1L, 1L, 1L))
  }

  test("empty first stage: zero base reports conv_permille 0, not DIVIDE_BY_ZERO") {
    // no event matches stages.head ("view") → every stage count is 0; under
    // ANSI the unguarded integer division would throw
    val out = run((1L, "click", 1L), (1L, "purchase", 2L))
    assert(out.map(r => (r._3, r._4)).toSeq === Seq((0L, 0L), (0L, 0L), (0L, 0L)))
  }

  test("frontier is the EARLIEST valid completion, not any completion") {
    // user views at 10; the click at 1 is too early, the click at 20 counts;
    // purchase at 15 precedes the valid click → not converted
    val out = run((1L, "view", 10L), (1L, "click", 1L), (1L, "click", 20L),
      (1L, "purchase", 15L))
    assert(out.map(_._3).toSeq === Seq(1L, 1L, 0L))
  }

  test("frontierTimes exposes the per-user min-ts chain behind conversion") {
    val evs = Seq(
      (1L, "view", 10L), (1L, "click", 15L), (1L, "purchase", 20L),
      (2L, "view", 30L),                      // stalls at stage 1
      (3L, "purchase", 5L))                   // never views → no frontier
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.frontierTimes(evs, "user_id", "event_type", "ts", stages)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, "view", 10L), (2L, 1L, "view", 30L),
      (1L, 2L, "click", 15L),
      (1L, 3L, "purchase", 20L)))
  }
}
