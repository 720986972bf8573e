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

  /** The halo-explode formulation peakConcurrency replaces (r16): each row
    * covers minutes [m, m+halo], distinct (key, minute), count per minute,
    * top-k by (count DESC, minute ASC).
    */
  private def naivePeak(df: org.apache.spark.sql.DataFrame, halo: Long, k: Int) =
    df.select(col("k"), explode(sequence(col("m"), col("m") + halo)).as("minute"))
      .distinct()
      .groupBy(col("minute"))
      .agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("minute"))
      .limit(k)
      .as[(Long, Long)].collect().toSeq

  private def sweepPeak(df: org.apache.spark.sql.DataFrame, halo: Long, k: Int) =
    IntervalUnion.peakConcurrency(df, "k", "m", halo, k, "c")
      .as[(Long, Long)].collect().toSeq

  test("peakConcurrency equals the halo-explode formulation, ties and overlaps included") {
    // Deterministic pseudo-random instants: several keys, overlapping and
    // duplicate minutes, clusters that merge and gaps that do not — plus a
    // key whose halos overlap (the double-count trap the per-key merge
    // exists for).
    val rows = for {
      key <- 0L until 7L
      i <- 0 until 40
    } yield (key, ((i * 2654435761L + key * 40503L) % 300L).abs)
    val df = rows.toDF("k", "m")
    for (halo <- Seq(0L, 3L, 30L); k <- Seq(1, 5, 17)) {
      assert(sweepPeak(df, halo, k) === naivePeak(df, halo, k),
        s"halo=$halo k=$k")
    }
  }

  test("peakConcurrency: runs longer than k expand only their first k minutes, exactly") {
    // One key active [0, 100]: every minute has count 1; top-3 must be
    // minutes 0,1,2 — interior minutes of the run may never outrank them.
    val df = Seq((1L, 0L), (1L, 50L)).toDF("k", "m")
    assert(sweepPeak(df, 60L, 3) === Seq((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("peakConcurrency: null minutes drop, null keys count as one key") {
    val df = Seq(
      (Some(1L), Some(10L)), (Some(2L), Some(10L)),
      (None, Some(10L)), (None, Some(10L)), // one distinct null key
      (Some(3L), None) // null minute contributes nothing
    ).toDF("k", "m")
    assert(sweepPeak(df, 0L, 1) === Seq((10L, 3L)))
  }
}
