package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quant = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .withColumn("qv", transform(col("embedding"),
      x => floor(x.cast("double") * lit(1000000.0)).cast("double")))

  test("k-means is deterministic: identical centroids and assignments across runs") {
    val r1 = Clustering.kmeans(quant, "vec_id", "qv", k = 8, dim = 64, iters = 3)
    val r2 = Clustering.kmeans(quant, "vec_id", "qv", k = 8, dim = 64, iters = 3)
    assert(r1.centroids === r2.centroids)
    assert(r1.assignments.orderBy("id").collect().toSeq ===
      r2.assignments.orderBy("id").collect().toSeq)
  }

  test("Lloyd iterations never increase inertia") {
    val inertias = (1 to 4).map { it =>
      val r = Clustering.kmeans(quant, "vec_id", "qv", k = 8, dim = 64, iters = it)
      Clustering.inertia(quant, "vec_id", "qv", r.centroids)
    }
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"inertia increased: $inertias")
    }
  }

  test("k-means centroids drive IVF as trained seeds") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val trained = Clustering.kmeans(quant, "vec_id", "qv", k = 16, dim = 64, iters = 2)
      .centroids.map { case (c, v) => (c.toLong, v.map(_ / 1000000.0)) }
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, "vec_id", emb, "vec_id", "embedding", k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(q, "vec_id", emb, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4, trainedSeeds = Some(trained))
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"trained-IVF recall $recall unreasonably low")
    assert(approx.groupBy(_._1).forall(_._2.size == 5))
  }

  test("per-subspace trained codebooks drive PQ/ADC") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // train on quantized slices (deterministic), scale codewords back to the
    // raw embedding domain for serving
    val trained = Clustering.trainPqCodebooks(
      quant, "qv", m = 8, ncode = 16, dim = 64, iters = 2, idCol = "vec_id")
      .map(_.map(_.map(_ / 1000000.0)))
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, "vec_id", emb, "vec_id", "embedding", k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopK(q, "vec_id", emb, "vec_id", "embedding",
      k = 5, m = 8, ncode = 16, dim = 64, trainedCodebooks = Some(trained))
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"trained-PQ recall $recall unreasonably low")
    assert(approx.groupBy(_._1).forall(_._2.size == 5))
  }

  test("IVF+PQ combined serving path: trained indexes, cell-bounded ADC scoring") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val seeds = Clustering.kmeans(quant, "vec_id", "qv", k = 16, dim = 64, iters = 2)
      .centroids.map { case (c, v) => (c.toLong, v.map(_ / 1000000.0)) }
    val books = Clustering.trainPqCodebooks(
      quant, "qv", m = 8, ncode = 16, dim = 64, iters = 2, idCol = "vec_id")
      .map(_.map(_.map(_ / 1000000.0)))
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, "vec_id", emb, "vec_id", "embedding", k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfPqTopK(q, "vec_id", emb, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6, m = 8, ncode = 16, dim = 64,
      trainedSeeds = Some(seeds), trainedCodebooks = Some(books))
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.15, s"IVF+PQ recall $recall unreasonably low (two approximations compose)")
    assert(approx.groupBy(_._1).forall(_._2.size == 5))
  }

  test("every row is assigned to its true nearest centroid") {
    val r = Clustering.kmeans(quant, "vec_id", "qv", k = 8, dim = 64, iters = 2)
    val cents = r.centroids
    val rows = Clustering.assign(
      quant.select(col("vec_id").as("id"), col("qv").cast("array<double>").as("v")),
      "v", cents)
      .select("id", "v", "cell").collect()
    rows.take(50).foreach { row =>
      val v = row.getSeq[Double](1)
      val best = cents.minBy { case (c, cv) =>
        (cv.foldLeft(0.0)((a, x) => a + x * x) -
          2.0 * v.zip(cv).foldLeft(0.0)((a, p) => a + p._1 * p._2), c)
      }._1
      assert(row.getInt(2) === best, s"row ${row.getLong(0)} mis-assigned")
    }
  }
}
