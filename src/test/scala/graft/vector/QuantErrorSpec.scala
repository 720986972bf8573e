package graft.vector

import graft.SparkSpec

class QuantErrorSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed SQ8 round-trip error on the 10^4 grid") {
    // v1 = [1.0, 0.5]: q = [10000, 5000], M = 10000
    //   codes = [127, 63] (127·5000 div 10⁴ = 63), recon = [10000, 4960]
    //   err = 40² = 1600, energy = 1.25e8 → ppm = 1.6e9 div 1.25e8 = 12
    // v2 = [0.25, 0.25]: codes both 127 → exact round-trip, ppm 0
    // v3 = [0.0, 0.0]: mx = 0 → excluded
    // global = 1.6e9 div 1.375e8 = 11
    val df = Seq(
      (1L, Seq(1.0f, 0.5f)),
      (2L, Seq(0.25f, 0.25f)),
      (3L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = QuantError.sq8Distortion(df, "vec_id", "embedding", topK = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 1600L, 125000000L, 12L, 11L),
      (2L, 0L, 12500000L, 0L, 11L)))
  }

  test("negative components truncate symmetrically (toward zero)") {
    // [-0.5, 1.0]: q = [-5000, 10000]; code(-5000) = -63 (truncation, not
    // floor), recon = -4960, err = 40² — identical magnitude to the
    // positive case, so the sign never perturbs the audit.
    val df = Seq((7L, Seq(-0.5f, 1.0f))).toDF("vec_id", "embedding")
    val out = QuantError.sq8Distortion(df, "vec_id", "embedding", topK = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((7L, 1600L, 125000000L, 12L, 12L)))
  }

  test("worst-first ordering and topK cap") {
    // 0.9999 floors to 9999: M = 9999, code(9999) = 127, recon = 9999 —
    // single-component vectors always round-trip exactly; mix with v1 to
    // check ordering by ppm desc.
    val df = Seq(
      (1L, Seq(1.0f, 0.5f)),
      (2L, Seq(0.9999f, 0.0f))).toDF("vec_id", "embedding")
    val out = QuantError.sq8Distortion(df, "vec_id", "embedding", topK = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) === Seq(1L) && out.head._4 === 12L)
  }
}
