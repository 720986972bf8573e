package graft.relational

import graft.SparkSpec

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("equi-depth buckets are remainder-first with exact bounds and NDV") {
    val df = (1L to 7L).map(v => (v, v * 10)).toDF("v", "id")
    val out = Histogram.equiDepth(df, "v", "id", k = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 3L, 1L, 3L),
      (2L, 2L, 2L, 4L, 5L),
      (3L, 2L, 2L, 6L, 7L)))
  }

  test("a value straddling a boundary appears in both buckets' NDV") {
    // six rows of value 5 and two of 9, k=2 → each bucket 4 rows; value 5
    // spans both buckets, so NDV = 1 and 2
    val df = (1L to 6L).map(i => (5L, i)) ++ Seq((9L, 7L), (9L, 8L))
    val out = Histogram.equiDepth(df.toDF("v", "id"), "v", "id", k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 1L, 5L, 5L),
      (2L, 4L, 2L, 5L, 9L)))
  }

  test("k outside the contract is refused") {
    val df = Seq((1L, 1L)).toDF("v", "id")
    intercept[IllegalArgumentException](Histogram.equiDepth(df, "v", "id", 1))
  }
}
