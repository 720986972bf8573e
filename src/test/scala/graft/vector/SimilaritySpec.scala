package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("cosine matches a local reference computation") {
    val rows = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val local = {
      val a = rows(0)._2.map(_.toDouble); val b = rows(1)._2.map(_.toDouble)
      val dot = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      val na = math.sqrt(a.map(x => x * x).foldLeft(0.0)(_ + _))
      val nb = math.sqrt(b.map(x => x * x).foldLeft(0.0)(_ + _))
      dot / (na * nb)
    }
    val got = emb.filter(col("vec_id") === rows(0)._1).crossJoin(
      emb.filter(col("vec_id") === rows(1)._1).select(col("embedding").as("e2")))
      .select(VectorFunctions.cosine(col("embedding"), col("e2"))).as[Double].head()
    assert(got === local) // bitwise: same sequential double fold
  }

  test("LSH top-k recall vs brute force") {
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, "vec_id", emb, "vec_id", "embedding", k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    // multi-probe LSH (bucket + 1-bit flips) → decent recall at tiny cost
    val approx = Similarity.lshTopK(q, "vec_id", emb, "vec_id", "embedding",
      k = 5, numPlanes = 4, dim = 64)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH multi-probe recall $recall unreasonably low")
    // every LSH result must be from the same bucket AND scored correctly:
    // approx results are a subset of the full scored cross product — sanity
    assert(approx.forall { case (qid, cid) => qid != cid })
  }

  test("BQ hamming top-k: recall vs brute force, codes match local sign bits") {
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, "vec_id", emb, "vec_id", "embedding", k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = Similarity.bqTopK(q, "vec_id", emb, "vec_id", "embedding",
      k = 5, rerank = 50, dim = 64)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"BQ recall $recall unreasonably low for rerank=50")

    // packed code equals a locally computed sign mask (incl. bit 63 path)
    val row = emb.filter(col("vec_id") === 7)
      .select(col("embedding")).as[Array[Float]].head()
    val local = row.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
      if (x > 0f) acc + (1L << i) else acc
    }
    val got = emb.filter(col("vec_id") === 7)
      .select(VectorFunctions.signBits(col("embedding"), 64)).as[Long].head()
    assert(got === local)
  }

  test("PQ/ADC top-k recall vs brute force") {
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, "vec_id", emb, "vec_id", "embedding", k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopK(q, "vec_id", emb, "vec_id", "embedding",
      k = 5, m = 8, ncode = 16, dim = 64)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    // codebook is untrained (first-16 subvectors), so the bar is modest:
    // the quantized ranking must still agree with the exact one well above
    // chance (random top-5 of ~500 candidates ⇒ recall ≈ 0.01)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"PQ/ADC recall $recall unreasonably low")
    assert(approx.forall { case (qid, cid) => qid != cid })
    // every query returns exactly k rows (quantized scores still totally
    // ordered by (score, cid))
    val counts = Similarity.pqTopK(q, "vec_id", emb, "vec_id", "embedding",
      k = 5, m = 8, ncode = 16, dim = 64)
      .groupBy("qid").count().select("count").as[Long].collect()
    assert(counts.forall(_ === 5L))
  }

  test("centroids: n sums to row count and centroid norm is positive") {
    val c = Similarity.centroids(emb, "label", "embedding", 64)
    assert(c.agg(sum("n")).as[Long].head() === emb.count())
    val norms = c.select(VectorFunctions.norm(col("centroid"))).as[Double].collect()
    assert(norms.forall(n => n > 0 && n < 1))
  }

  test("IVF top-k recall vs brute force") {
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, "vec_id", emb, "vec_id", "embedding", k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, "vec_id", emb, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall unreasonably low (nprobe=4/16)")
  }

  test("codegen vec_dot/vec_cosine are bitwise-equal to the HOF fold forms") {
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.filter(col("vec_id") < 5).select(col("embedding").as("b")))
    val diffs = pairs.select(
      VectorFunctions.dot(col("a"), col("b")).as("d1"),
      VectorFunctions.dotFold(col("a"), col("b")).as("d2"),
      VectorFunctions.cosine(col("a"), col("b")).as("c1"),
      VectorFunctions.cosineFold(col("a"), col("b")).as("c2"))
      .filter(col("d1") =!= col("d2") || col("c1") =!= col("c2"))
      .count()
    assert(diffs === 0L, "native expressions must be bitwise-identical to folds")
  }

  test("typed VectorAvg aggregator agrees with the DataFrame centroid path") {
    val typed = emb.groupBy(col("label"))
      .agg(VectorAvg.vectorAvg(64, col("embedding")).as("c"))
      .select(col("label"), col("c")).as[(Int, Array[Double])].collect().toMap
    val framed = Similarity.centroids(emb, "label", "embedding", 64)
      .select(col("label"), col("centroid")).as[(Int, Array[Double])].collect().toMap
    assert(typed.keySet === framed.keySet)
    typed.foreach { case (label, c) =>
      c.zip(framed(label)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $label centroid mismatch")
      }
    }
  }

  test("scaledNlist/scaledPlanes: the √n bit-half formula, gate-stable") {
    // the formula must reproduce the historical literals at the gate sizes
    // (500 and 250 candidates → 16 cells / 4 planes) and scale as the
    // power-of-two floor of √n elsewhere; DuckDB twin verified in-session:
    // 1 << least(16, length(bin(n - 1)) // 2)
    def ofN(n: Int): Int = {
      val df = spark.range(n).toDF("id")
      Similarity.scaledNlist(df, "id")
    }
    assert(ofN(500) === 16 && ofN(250) === 16)
    assert(ofN(2000) === 32)
    assert(ofN(20000) === 128)
    assert(ofN(1) === 1 && ofN(2) === 1)
    // planes = log2(nlist); clamp at 16 planes
    assert(Similarity.scaledPlanes(spark.range(500).toDF("id"), "id") === 4)
    intercept[IllegalArgumentException] {
      Similarity.scaledNlist(spark.range(0).toDF("id"), "id")
    }
    // memoized for real, not just deterministic: a second call on an
    // identical (canonicalized) plan must NOT add a ledger entry — the
    // entry count is what tools/memo_bounds.json gates
    def nlistEntries: Long = graft.MemoLedger.snapshot()
      .find(_._1 == "similarity.nlist").map(_._2).getOrElse(0L)
    Similarity.scaledNlist(spark.range(777).toDF("id"), "id")
    val after1 = nlistEntries
    assert(Similarity.scaledNlist(spark.range(777).toDF("id"), "id") ===
      Similarity.scaledNlist(spark.range(777).toDF("id"), "id"))
    assert(nlistEntries === after1,
      "re-counting an identical plan must hit the memo, not grow it")
  }

  test("hyperplaneValues(P) is a prefix of hyperplaneValues(maxP)") {
    // the dynamic-prefix LSH oracle depends on this: activating the first
    // P of maxP seeded planes must equal drawing P planes directly
    val p4 = Similarity.hyperplaneValues(4, 64)
    val p16 = Similarity.hyperplaneValues(16, 64)
    assert(p16.take(4) === p4)
  }

  test("cosineNearDupPairs: scaled planes return the same pairs the fixed-4 table finds on the fixture") {
    // at the sf0.001 fixture size the formula yields few planes; the planted
    // near-dup pairs must survive the plane count the corpus size selects
    val planes = Similarity.scaledPlanes(emb, "vec_id")
    val scaled = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.45, numPlanes = planes, dim = 64)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, "vec_id", emb, "vec_id",
      "embedding", k = 50)
      .filter(col("score") >= 0.45 && col("qid") < col("cid"))
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    // LSH is a candidate screen: everything it returns is exact-verified
    // (score recomputed), so scaled ⊆ brute; and it must not be empty if
    // brute isn't
    assert(scaled.subsetOf(brute))
    if (brute.nonEmpty) assert(scaled.nonEmpty)
  }

  test("lshBucket produces stable buckets in [0, 2^planes)") {
    val planes = Similarity.hyperplaneValues(6, 64, seed = 42L)
    val buckets = emb.select(VectorFunctions.lshBucket(col("embedding"), planes))
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 64))
    assert(buckets.distinct.length > 1, "vectors should spread over buckets")
  }

  test("assignCells matches a local argmax-cosine reference; seeds self-assign") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val seeds = Similarity.lowestIdSeeds(emb, "vec_id", "embedding", nlist = 8)
    assert(seeds.map(_._1) === (0L until 8L))
    val got = Similarity.assignCells(emb, "embedding", seeds)
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap
    // every seed's best cell is itself (cosine 1 with itself, ties by sid)
    seeds.foreach { case (sid, _) => assert(got(sid) === sid) }
    // reference: local argmax over the same cosine with sid tiebreak
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>")).as[(Long, Seq[Double])].collect()
    vecs.foreach { case (id, v) =>
      val best = seeds.map { case (sid, sv) => (-cos(v, sv), sid) }.min._2
      assert(got(id) === best, s"vec $id")
    }
  }
}
