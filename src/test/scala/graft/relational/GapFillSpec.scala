package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("dailyCounts: dense grid, zero-filled gaps, mass preserved") {
    val df = Seq(
      ("a", "2024-01-01"), ("a", "2024-01-01"), ("a", "2024-01-04"),
      ("b", "2024-01-02")
    ).toDF("k", "d").select(col("k"), col("d").cast("date").as("d"))
    val got = GapFill.dailyCounts(df, Seq("k"), "d")
      .select(col("k"), col("d").cast("string"), col("n"))
      .as[(String, String, Long)].collect().toSet
    // global bounds 01-01..01-04 → 4 days × 2 keys = 8 rows
    assert(got.size === 8)
    assert(got.contains(("a", "2024-01-01", 2L)))
    assert(got.contains(("a", "2024-01-02", 0L))) // gap zero-filled
    assert(got.contains(("a", "2024-01-04", 1L)))
    assert(got.contains(("b", "2024-01-02", 1L)))
    assert(got.contains(("b", "2024-01-03", 0L)))
    assert(got.toSeq.map(_._3).sum === 4L) // total mass preserved
  }

  test("forwardFill carries the latest non-null within key; leading nulls stay") {
    val df = Seq(
      ("k", 1L, Some(10.0)), ("k", 2L, None), ("k", 3L, None), ("k", 4L, Some(7.0)),
      ("j", 1L, None), ("j", 2L, Some(1.0))
    ).toDF("k", "t", "v")
    val got = GapFill.forwardFill(df, Seq("k"), "t", Seq("v"))
      .as[(String, Long, Option[Double])].collect().toSet
    assert(got === Set(
      ("k", 1L, Some(10.0)), ("k", 2L, Some(10.0)), ("k", 3L, Some(10.0)), ("k", 4L, Some(7.0)),
      ("j", 1L, None), ("j", 2L, Some(1.0))))
  }
}
