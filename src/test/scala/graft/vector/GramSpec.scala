package graft.vector

import graft.SparkSpec

class GramSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed upper-triangle Gram on two 3-dim vectors") {
    // q rows at scale 1e4: (10000, 20000, -10000), (0, 10000, 30000)
    // G00 = 1e8 + 0 = 1e8; G01 = 2e8 + 0 = 2e8; G02 = -1e8 + 0 = -1e8
    // G11 = 4e8 + 1e8 = 5e8; G12 = -2e8 + 3e8 = 1e8; G22 = 1e8 + 9e8 = 1e9
    val d = Seq((1L, Seq(1.0f, 2.0f, -1.0f)), (2L, Seq(0.0f, 1.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val out = Gram.upperTriangle(d, "embedding", dim = 3)
      .select("dim_i", "dim_j", "n", "gram")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out.size === 6)
    assert(out((0L, 0L)) === ((2L, 100000000L)))
    assert(out((0L, 1L)) === ((2L, 200000000L)))
    assert(out((0L, 2L)) === ((2L, -100000000L)))
    assert(out((1L, 1L)) === ((2L, 500000000L)))
    assert(out((1L, 2L)) === ((2L, 100000000L)))
    assert(out((2L, 2L)) === ((2L, 1000000000L)))
  }

  test("random-vector parity: every cell equals the local quantized product sum") {
    val rnd = new scala.util.Random(20260814L)
    val dim = 5
    val vecs = (1L to 40L).map(i =>
      (i, Seq.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat)))
    val want = {
      val q = vecs.map(_._2.map(x => math.floor(x.toDouble * 10000.0).toLong))
      (for (i <- 0 until dim; j <- i until dim) yield
        (i.toLong, j.toLong) -> q.map(v => v(i) * v(j)).sum).toMap
    }
    val got = Gram.upperTriangle(vecs.toDF("vec_id", "embedding"), "embedding",
      dim = dim)
      .select("dim_i", "dim_j", "gram").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === want)
  }

  test("power iteration converges to the dominant axis of a diagonal Gram") {
    // G = diag(8e8, 1e8): v stays (1e6, x) with x shrinking 8x per round —
    // after 4 rounds x = 1e6/8^4 = 244 (truncated), growth = 8e8·1e6
    val d = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Gram.powerIteration(d, "embedding", dim = 2, rounds = 4)
      .select("dim", "v_micro", "growth")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) === ((0L, 1000000L, "800000000000000")))
    assert(out(1)._2 === 244L)
  }

  test("variance explained: single-axis data scores exactly 1000 permille") {
    // all mass on axis 0: the iteration zeroes the dead axis, the Rayleigh
    // quotient equals G00, and trace = G00 — the permille must be exact
    val d = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val row = Gram.varianceExplained(d, "embedding", dim = 2, rounds = 4)
      .select("dim", "trace", "lambda1_est", "explained_permille")
      .as[(Long, String, String, Long)].collect().head
    // trace = (2e4)² + (3e4)² = 13e8
    assert(row._2 === "1300000000")
    assert(row._3 === "1300000000")
    assert(row._4 === 1000L)
  }

  test("variance explained: two-axis split replays the exact integer iteration") {
    // G = diag(8e8, 1e8) (the powerIteration fixture): replicate the
    // 4-round truncating iteration sequentially and compare digit for digit
    val d = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val g = Array(Array(BigInt("800000000"), BigInt(0)),
      Array(BigInt(0), BigInt("100000000")))
    var v = Array(BigInt(1000000), BigInt(1000000))
    for (_ <- 1 to 4) {
      val w = Array(g(0)(0) * v(0), g(1)(1) * v(1))
      val m = w.map(_.abs).max
      v = w.map(_ * 1000000 / m)
    }
    val num = v(0) * v(0) * g(0)(0) + v(1) * v(1) * g(1)(1)
    val den = v(0) * v(0) + v(1) * v(1)
    val trace = g(0)(0) + g(1)(1)
    val row = Gram.varianceExplained(d, "embedding", dim = 2, rounds = 4)
      .select("lambda1_est", "explained_permille")
      .as[(String, Long)].collect().head
    assert(row._1 === (num / den).toString)
    assert(row._2 === (BigInt(1000) * num / (den * trace)).toLong)
  }

  test("fixture: d(d+1)/2 cells, diagonal positive, symmetric pairs absent") {
    val d = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = Gram.upperTriangle(d, "embedding", dim = 64)
      .select("dim_i", "dim_j", "gram").as[(Long, Long, Long)].collect()
    assert(out.length === 64 * 65 / 2)
    assert(out.forall { case (i, j, _) => i <= j })
    assert(out.filter { case (i, j, _) => i == j }
      .forall { case (_, _, g) => g > 0L })
  }
}
