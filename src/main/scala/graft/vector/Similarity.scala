package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns: exact brute-force top-k as the
  * correctness baseline, random-hyperplane LSH bucketing as the scale path.
  *
  * Scale shape: brute force is a broadcast nested-loop of Q queries against N
  * candidates — fine when Q is small (the query set broadcasts; the big side
  * streams, never shuffles). For N×N all-pairs (near-dup) or large Q, LSH
  * buckets cut candidates from O(N) to O(N/2^bits) per probe with a
  * co-partitioned equi-join on bucket id — the right plan at 100 TB.
  */
object Similarity {

  /** Deterministic random hyperplane values, seeded — no RNG at execution
    * time, so plans are reproducible, the same planes can be re-created on
    * any cluster, and an external oracle can embed the identical literals.
    */
  def hyperplaneValues(numPlanes: Int, dim: Int,
                       seed: Long = 42L): IndexedSeq[IndexedSeq[Double]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(numPlanes)(IndexedSeq.fill(dim)(rnd.nextGaussian()))
  }



  /** Exact cosine top-k neighbors for each query vector.
    *
    * @param queries    (qidCol, vecCol) — SMALL side, gets broadcast
    * @param candidates (cidCol, vecCol)
    */
  def bruteForceTopK(queries: DataFrame, qidCol: String,
                     candidates: DataFrame, cidCol: String,
                     vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(qidCol).as("qid"), col(vecCol).as("qvec"))
    val c = candidates.select(col(cidCol).as("cid"), col(vecCol).as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("qid") =!= col("cid") else lit(true))
      .withColumn("score", VectorFunctions.cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "score")
  }

  /** Attach an LSH bucket id column. */
  def withBucket(df: DataFrame, vecCol: String, planes: Seq[Seq[Double]],
                 bucketCol: String = "bucket"): DataFrame =
    df.withColumn(bucketCol, VectorFunctions.lshBucket(col(vecCol), planes))

  /** Approximate top-k: candidates restricted to the query's LSH bucket plus
    * all 1-bit-flip neighbor buckets (multi-probe). Still an equi-join on
    * bucket id — co-partitionable, no cross product; probing multiplies only
    * the tiny query side by (numPlanes+1). Recall is tunable via numPlanes
    * (fewer planes ⇒ bigger buckets ⇒ higher recall, more compute) and the
    * probe radius.
    */
  def lshTopK(queries: DataFrame, qidCol: String,
              candidates: DataFrame, cidCol: String,
              vecCol: String, k: Int, numPlanes: Int, dim: Int,
              seed: Long = 42L): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val planes = hyperplaneValues(numPlanes, dim, seed)
    val q = withBucket(queries.select(col(qidCol).as("qid"), col(vecCol).as("qvec")), "qvec", planes)
      .withColumn("bucket", explode(concat(array(col("bucket")),
        transform(sequence(lit(0), lit(numPlanes - 1)),
          i => col("bucket").bitwiseXOR(call_function("shiftleft", lit(1L), i.cast("int")))))))
    val c = withBucket(candidates.select(col(cidCol).as("cid"), col(vecCol).as("cvec")), "cvec", planes)
    val scored = c.join(q, "bucket")
      .filter(col("qid") =!= col("cid"))
      .withColumn("score", VectorFunctions.cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    scored
      .select("qid", "cid", "score").distinct() // multi-probe may hit a pair twice
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "score")
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs sharing a
    * bucket with cosine ≥ threshold. DataFrame-only, equi-join on bucket.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, numPlanes: Int, dim: Int,
                         seed: Long = 42L): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val planes = hyperplaneValues(numPlanes, dim, seed)
    val b = withBucket(df.select(col(idCol).as("id"), col(vecCol).as("vec")), "vec", planes)
    // multi-probe one side with 1-bit flips so pairs differing in a single
    // hyperplane sign still meet in a bucket (recall ≈ P[≤1 bit differs])
    val l = b.select(col("bucket"), col("id").as("id1"), col("vec").as("v1"))
      .withColumn("bucket", explode(concat(array(col("bucket")),
        transform(sequence(lit(0), lit(numPlanes - 1)),
          i => col("bucket").bitwiseXOR(call_function("shiftleft", lit(1L), i.cast("int")))))))
    val r = b.select(col("bucket"), col("id").as("id2"), col("vec").as("v2"))
    l.join(r, "bucket")
      .filter(col("id1") < col("id2"))
      .withColumn("score", VectorFunctions.cosine(col("v1"), col("v2")))
      .filter(col("score") >= threshold)
      .select("id1", "id2", "score").distinct()
  }

  /** IVF-style approximate top-k: coarse-quantize candidates into `nlist`
    * cells (nearest of `nlist` deterministic seed vectors — the lowest-id
    * candidates), then search only each query's `nprobe` nearest cells with
    * exact cosine re-ranking.
    *
    * Scale shape: cell assignment is a broadcast join against `nlist` seed
    * vectors (one pass over the candidates, results cacheable as the
    * "index"); the search joins queries to cells equi-on cell id — candidate
    * work drops to ~nprobe/nlist of brute force. Seeds are data rows, so no
    * RNG and the index is reproducible.
    */
  def ivfTopK(queries: DataFrame, qidCol: String,
              candidates: DataFrame, cidCol: String,
              vecCol: String, k: Int, nlist: Int, nprobe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    // Index build: the nlist seed vectors come to the driver once (an IVF
    // centroid table is nlist rows — tiny at any data scale) and become
    // per-row literals. Cell assignment is then a shuffle-free map over the
    // candidates: nlist codegen'd cosines + a bounded array_sort per row,
    // instead of the previous join(seeds) × window-argmax, whose N×nlist
    // intermediate shuffle was the plan's scale-killer.
    val seedRows = candidates
      .select(col(cidCol).cast("long").as("sid"),
        col(vecCol).cast("array<double>").as("svec"))
      .orderBy(col("sid")).limit(nlist).collect()
    val seeds: Seq[(Long, Seq[Double])] =
      seedRows.toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))

    // Nearest-nCells cell ids for each row: sort struct(-cosine, sid) asc ==
    // cosine desc with sid tiebreak — identical ordering to the old window.
    def assign(df: DataFrame, vecC: String, nCells: Int, outCol: String): DataFrame = {
      val perSeed = seeds.map { case (sid, svec) =>
        struct((-VectorFunctions.cosine(col(vecC), array(svec.map(lit): _*))).as("nscore"),
          lit(sid).as("sid"))
      }
      df.withColumn("__cell_s", explode(slice(array_sort(array(perSeed: _*)), 1, nCells)))
        .withColumn(outCol, col("__cell_s").getField("sid"))
        .drop("__cell_s")
    }

    val cells = assign(candidates.select(col(cidCol).as("cid"), col(vecCol).as("cvec")),
      "cvec", 1, "cell")
    val probed = assign(queries.select(col(qidCol).as("qid"), col(vecCol).as("qvec")),
      "qvec", nprobe, "cell")

    val scored = cells.join(probed, "cell")
      .filter(col("qid") =!= col("cid"))
      .withColumn("score", VectorFunctions.cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    scored.select("qid", "cid", "score").distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "score")
  }

  /** Per-label centroids (typed aggregation over array<float>): mean vector
    * per group via element-wise decimal-free double sums — used for IVF-style
    * coarse quantization (assign → nearest centroid bucket).
    */
  def centroids(df: DataFrame, labelCol: String, vecCol: String, dim: Int): DataFrame = {
    val summed = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"),
        array((0 until dim).map(i => sum(element_at(col(vecCol), i + 1).cast("double"))): _*).as("sums"))
    summed.select(col("label"), col("n"),
      transform(col("sums"), s => s / col("n").cast("double")).as("centroid"))
  }
}
