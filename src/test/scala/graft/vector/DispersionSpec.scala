package graft.vector

import graft.SparkSpec

class DispersionSpec extends SparkSpec {
  import spark.implicits._

  test("dispersion equals n x brute-force pairwise sum (sums identity)") {
    // label 0: q = (0, 10000, 30000) at scale 1e4 → pairwise d²:
    // (0,1): 1e8; (0,3): 9e8; (1,3): 4e8 → Σ_{i<j} = 14e8
    // identity value n·Q − S² = 3·(0+1e8+9e8) − (4e4)² = 30e8 − 16e8 = 14e8
    val d = Seq((1L, Seq(0.0f), 0), (2L, Seq(1.0f), 0), (3L, Seq(3.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Dispersion.perGroup(d, "label", "embedding")
      .select("n", "dispersion").as[(Long, String)].head()
    assert(out === ((3L, "1400000000")))
  }

  test("identical vectors have zero dispersion; drift of equal halves is zero") {
    val same = Seq((1L, Seq(0.5f, -0.5f), 7), (2L, Seq(0.5f, -0.5f), 7))
      .toDF("vec_id", "embedding", "label")
    assert(Dispersion.perGroup(same, "label", "embedding")
      .select("dispersion").as[String].head() === "0")
    val out = Dispersion.halfDrift(same, "embedding",
      org.apache.spark.sql.functions.col("vec_id") <= 1L)
      .select("n_first", "n_second", "shift2_scaled")
      .as[(Long, Long, String)].head()
    assert(out === ((1L, 1L, "0")))
  }

  test("fixture: dispersion positive per label, drift detects the id split") {
    val d = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val disp = Dispersion.perGroup(d, "label", "embedding")
      .select("dispersion").as[String].collect()
    assert(disp.length === 10)
    assert(disp.forall(s => BigInt(s) > 0))
    val drift = Dispersion.halfDrift(d, "embedding",
      org.apache.spark.sql.functions.col("vec_id") < 250L)
      .select("shift2_scaled").as[String].head()
    assert(BigInt(drift) >= 0)
  }

  test("ragged vector dims fail perGroup loudly instead of a wrong n") {
    val ragged = Seq((1L, Seq(1.0f, 2.0f), 0), (2L, Seq(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      Dispersion.perGroup(ragged, "label", "embedding")
        .select("dispersion").as[String].collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("ragged vector dims fail halfDrift loudly; dims cap guards the collect") {
    val ragged = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dispersion.halfDrift(ragged, "embedding",
        org.apache.spark.sql.functions.col("vec_id") <= 1L)
    }
    assert(e.getMessage.contains("ragged"))
    val wide = Seq((1L, (1 to 8).map(_.toFloat)), (2L, (1 to 8).map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val cap = intercept[IllegalArgumentException] {
      Dispersion.halfDrift(wide, "embedding",
        org.apache.spark.sql.functions.col("vec_id") <= 1L, maxDims = 4)
    }
    assert(cap.getMessage.contains("maxDims"))
  }

  test("halfDrift squares exactly past the 38-digit decimal ceiling (BigInt path)") {
    // per-dim sums near 1e12 with unequal halves drive (n2*s1 - n1*s2)^2
    // well past what a DECIMAL(38,0) plan could hold per-dim if n were
    // larger; here we just assert the driver-side BigInt agrees with a
    // hand computation on asymmetric halves
    val d = Seq(
      (1L, Seq(3.0f)), (2L, Seq(5.0f)),          // first half: s1 = 8e4, n1 = 2
      (3L, Seq(100.0f)))                          // second: s2 = 1e6, n2 = 1
      .toDF("vec_id", "embedding")
    val out = Dispersion.halfDrift(d, "embedding",
      org.apache.spark.sql.functions.col("vec_id") <= 2L)
      .select("n_first", "n_second", "shift2_scaled")
      .as[(Long, Long, String)].head()
    // n2*s1 - n1*s2 = 1*80000 - 2*1000000 = -1920000 → squared
    assert(out === ((2L, 1L, (BigInt(-1920000) * BigInt(-1920000)).toString)))
  }
}
