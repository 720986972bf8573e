package graft.streaming

import graft.SparkSpec

/** The oracle-graded streaming queries run repeatedly inside one JVM
  * session across Verify / Bench / PlanAudit — each run spins up a fresh
  * memory sink (unique name) and checkpoint, so results must be identical
  * on every repeat. This spec locks that in for the cheap streaming rows
  * at sf0.001; a regression here (leaked sink name, shared checkpoint,
  * nondeterministic in-batch reduce) would poison a whole gate run.
  */
class StreamQueryRepeatSpec extends SparkSpec {

  private def runTwice(name: String): Unit = {
    val fn = graft.SparkEntry.queries(name)
    def rows() = fn(spark, sf0001).collect().map(_.toString).sorted.toSeq
    val first = rows()
    val second = rows()
    assert(first.nonEmpty, s"$name returned no rows")
    assert(first === second, s"$name differs across repeats in one session")
  }

  test("stream_dedup_firstseen is repeat-deterministic") {
    runTwice("stream_dedup_firstseen")
  }

  test("stream_union_effectively_once is repeat-deterministic") {
    runTwice("stream_union_effectively_once")
  }

  test("stream_session_counts is repeat-deterministic") {
    runTwice("stream_session_counts")
  }

  test("stream_static_enrichment is repeat-deterministic") {
    runTwice("stream_static_enrichment")
  }
}
