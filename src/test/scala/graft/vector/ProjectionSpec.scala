package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("sign matrix is deterministic, ±1-valued, seed-sensitive") {
    val a = Projection.rademacherSigns(16, 4, "s1")
    val b = Projection.rademacherSigns(16, 4, "s1")
    val c = Projection.rademacherSigns(16, 4, "s2")
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq !== c.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
    // both signs actually occur (a constant matrix projects onto one line)
    assert(a.flatten.toSet === Set(1.0, -1.0))
  }

  test("projection equals the driver-side matrix product") {
    val signs = Projection.rademacherSigns(8, 3, "spec")
    val vec = Seq(1.0, -2.0, 0.5, 3.0, 0.0, -1.5, 2.5, 4.0)
    val got = Seq(Tuple1(vec)).toDF("v")
      .select(Projection.project(col("v"), signs).as("p"))
      .as[Seq[Double]].head()
    val want = signs.map(row => row.zip(vec).foldLeft(0.0) {
      case (acc, (s, x)) => acc + s * x
    })
    assert(got === want.toSeq)
  }

  test("JL property: distortion is bounded and shrinks with output dimension") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(60)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    def mae(dimOut: Int): Double = {
      val signs = Projection.rademacherSigns(64, dimOut, "jl-v1")
      val both = emb.withColumn("p", Projection.project(col("v"), signs))
      val a = both.select(col("vec_id").as("id1"), col("v").as("v1"), col("p").as("p1"))
      val b = both.select(col("vec_id").as("id2"), col("v").as("v2"), col("p").as("p2"))
      val pairs = a.join(b, col("id1") < col("id2"))
        .select(
          VectorFunctions.cosine(col("v1"), col("v2")).as("exact"),
          VectorFunctions.cosine(col("p1"), col("p2")).as("proj"))
        .as[(Double, Double)].collect()
      pairs.map { case (e, p) => math.abs(e - p) }.sum / pairs.length
    }

    // per-pair cosine error is ~1/sqrt(dimOut); the mean must sit inside
    // the bound at 16 dims and SHRINK as the output widens (the actual JL
    // scaling — a broken projection would show flat or growing error)
    val m16 = mae(16)
    val m48 = mae(48)
    assert(m16 < 0.25, s"mean |exact-proj| at 16 dims = $m16 — geometry lost")
    assert(m48 < m16, s"distortion must shrink with dimOut: 16→$m16, 48→$m48")
  }
}
