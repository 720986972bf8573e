package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalUnionSpec extends SparkSpec {
  import spark.implicits._

  private def at(secs: Seq[(Long, Long)]) =
    secs.toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))

  private def run(df: org.apache.spark.sql.DataFrame, len: Long) =
    IntervalUnion.coverage(df, "k", "ts", len)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)

  test("disjoint intervals each open their own segment") {
    // len 10, starts 0 / 100 / 200: three segments of 10s each; span 210.
    val out = run(at(Seq((1L, 0L), (1L, 100L), (1L, 200L))), 10L)
    assert(out === Array((1L, 3L, 3L, 30L, 210L, (1000L * 30) / 210)))
  }

  test("an overlapping chain merges into one segment of max-end minus min-start") {
    // len 10, starts 0,5,12 → [0,10)∪[5,15)∪[12,22) = [0,22): connected.
    val out = run(at(Seq((1L, 0L), (1L, 5L), (1L, 12L))), 10L)
    assert(out === Array((1L, 3L, 1L, 22L, 22L, 1000L)))
  }

  test("duplicate instants never split a segment (tie-insensitivity)") {
    val out = run(at(Seq((1L, 0L), (1L, 0L), (1L, 0L))), 10L)
    assert(out === Array((1L, 3L, 1L, 10L, 10L, 1000L)))
  }

  test("keys are independent and an abutting interval (start == prior end) merges") {
    // [0,10) then [10,20): start 10 is NOT > prior max end 10 → same
    // segment, union [0,20) — half-open abutment is seamless coverage.
    val out = run(at(Seq((1L, 0L), (1L, 10L), (2L, 0L), (2L, 11L))), 10L)
    assert(out === Array(
      (1L, 2L, 1L, 20L, 20L, 1000L),
      (2L, 2L, 2L, 20L, 21L, (1000L * 20) / 21)))
  }

  test("a zero or negative interval length is refused loudly") {
    intercept[IllegalArgumentException] {
      IntervalUnion.coverage(at(Seq((1L, 0L))), "k", "ts", 0L)
    }
  }
}
