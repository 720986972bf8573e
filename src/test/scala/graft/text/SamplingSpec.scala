package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("deterministic sample is invariant under repartitioning and rerun") {
    val a = Sampling.deterministicSample(docs, col("doc_id"), 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(17), col("doc_id"), 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b, "sample must not depend on partitioning")
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"fraction $frac far from 0.3")
  }

  test("split tags partition the data and are stable") {
    val tagged = docs.withColumn("split", Sampling.splitTag(col("doc_id"), 0.25))
    val counts = tagged.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "eval"))
    assert(counts.values.sum === docs.count())
    // every doc has exactly one stable tag
    val again = docs.repartition(7)
      .withColumn("split", Sampling.splitTag(col("doc_id"), 0.25))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = tagged.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again === first)
  }

  test("systematic weighted sample: ~k rows, weight-proportional, partition-invariant") {
    val k = 12
    val a = Sampling.systematicWeightedSample(docs, "doc_id", col("n_chars"), k)
      .select("doc_id").as[Long].collect().toSeq.sorted
    // grid sampling yields k or k±1 rows (boundary alignment)
    assert(math.abs(a.size - k) <= 1, s"got ${a.size} rows for k=$k")
    // invariant under a different pre-partitioning and numParts
    val b = Sampling.systematicWeightedSample(
      docs.repartition(13), "doc_id", col("n_chars"), k, numParts = 5)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(a === b)
    // a row heavier than the whole step is always selected
    val heavy = (Seq((0L, 1L)) ++ (1L to 50L).map(i => (i, 1000000L))).toDF("id", "w")
    val got = Sampling.systematicWeightedSample(heavy, "id", col("w"), 10)
      .select("id").as[Long].collect().toSet
    assert(!got.contains(0L) || got.size >= 10) // the 1-weight row is ~never on the grid
    assert((1L to 50L).count(got.contains) >= 9)
  }

  test("stratified sample takes exactly perStratum per group") {
    val sample = Sampling.stratifiedSample(docs, Seq("lang"), col("doc_id"), 7)
    val perLang = sample.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.values.forall(_ === 7L))
  }

  test("quota mix sample hits exact proportional quotas without upsampling") {
    // groups: a=100 rows w=1, b=50 rows w=1, c=90 rows w=3.
    // binding group: c (90/3=30 units) vs a (100), b (50) -> T=30 units
    // quotas: a=30, b=30, c=90 — proportions 1:1:3 exactly, c fully used.
    val rows = (1L to 100L).map(i => ("a", i)) ++
      (101L to 150L).map(i => ("b", i)) ++ (151L to 240L).map(i => ("c", i))
    val df = rows.toDF("source", "id")
    val wcol = when(col("source") === "c", 3L).otherwise(1L)
    val kept = Sampling.quotaMixSample(df, "source", col("id"), wcol)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept === Map("a" -> 30L, "b" -> 30L, "c" -> 90L))
  }

  test("quota mix membership is deterministic under repartitioning") {
    val rows = (1L to 100L).map(i => ("a", i)) ++ (101L to 140L).map(i => ("b", i))
    val df = rows.toDF("source", "id")
    val a = Sampling.quotaMixSample(df.repartition(1), "source", col("id"), lit(1L))
      .select("id").as[Long].collect().toSeq.sorted
    val b = Sampling.quotaMixSample(df.repartition(9), "source", col("id"), lit(1L))
      .select("id").as[Long].collect().toSeq.sorted
    assert(a === b)
  }

  test("epoch shuffle keys give a full permutation per epoch, different across epochs") {
    val df = (1L to 200L).toDF("id")
    def order(e: Int): Seq[Long] = df
      .withColumn("k", Sampling.epochShuffleKey(e, col("id")))
      .orderBy(col("k"), col("id")).select("id").as[Long].collect().toSeq
    val e0 = order(0); val e1 = order(1)
    assert(e0.sorted === (1L to 200L))          // a permutation, nothing lost
    assert(e1.sorted === (1L to 200L))
    assert(e0 !== e1)                           // epochs reshuffle
    assert(e0 === order(0))                     // reproducible
  }

  test("leakage-safe split: components are atomic, singletons match doc-keyed split") {
    val nodes = (1L to 100L).toDF("id")
    // components: {1..5} via a chain, {10,11}, everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val split = Sampling.leakageSafeSplit(nodes, "id", pairs, "a", "b", 0.25)
      .select("id", "comp", "split")
      .as[(Long, Long, String)].collect()
    // atomicity: every component maps to exactly one split
    val perComp = split.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perComp.values.forall(_.size == 1),
      "a near-dup component straddles train/eval")
    // near-dups share their component's tag
    val byId = split.map(t => t._1 -> t._3).toMap
    assert((1L to 5L).map(byId).toSet.size === 1)
    assert(Set(byId(10L), byId(11L)).size === 1)
    // singletons split exactly as a doc-keyed splitTag would (comp == id)
    val singleton = split.filter(t => t._1 > 11L)
    val docKeyed = (12L to 100L).toDF("id")
      .withColumn("s", Sampling.splitTag(col("id"), 0.25))
      .as[(Long, String)].collect().toMap
    assert(singleton.forall(t => docKeyed(t._1) == t._3))
  }

  test("HT audit reconstructs a count from a size-biased sample, exactly replayed") {
    // 100 docs, weights cycling 1..10 (W = 550): the k=20 systematic PPS
    // sample is size-biased toward heavy docs; the 1/pi correction must
    // pull the count estimate back toward 100. Brute-force local replay
    // of the identical integer arithmetic is the assertion.
    val rows = (1L to 100L).map(i => (i, 1L + (i - 1) % 10))
    val df = rows.toDF("id", "w")
    val out = Sampling.htTotalAudit(df, "id", col("w"), lit(1L), Seq(20))
      .as[(Long, Long, Long, Long, Long)].collect().head
    val total = rows.map(_._2).sum
    var cw = 0L
    val contrib = rows.flatMap { case (_, w) =>
      val prev = cw; cw += w
      if (cw * 20 / total > prev * 20 / total)
        Some(math.max(1000L, 1000L * total / (20L * w)))
      else None
    }
    assert(out._1 === 20L && out._2 === contrib.size.toLong)
    assert(out._3 === 100L)
    assert(out._4 === contrib.sum)
    assert(out._5 === 1000L * (contrib.sum - 100000L) / 100000L)
    // quality: the PERIODIC weight cycle deliberately aliases with the
    // systematic grid (step W/k = 27.5 against period-10 weights — the
    // textbook systematic-sampling pathology), so exactness not
    // unbiasedness is the contract here; even so the 1/pi correction
    // must land strictly closer to the truth than the uncorrected
    // sample count (which reads 20 of 100)
    assert(math.abs(out._4 - 100000L) < math.abs(1000L * out._2 - 100000L),
      s"HT ${out._4} must improve on the uncorrected ${1000L * out._2}")
  }

  test("HT audit certainty clamp: a mega-unit contributes itself, not a deflated ratio") {
    // one unit holds ~all the weight: k*w >= W makes pi = 1 — its
    // contribution must be y (1000 milli), not W/(k*w) < 1
    val rows = Seq((1L, 1000L), (2L, 1L), (3L, 1L))
    val df = rows.toDF("id", "w")
    val out = Sampling.htTotalAudit(df, "id", col("w"), lit(1L), Seq(2))
      .as[(Long, Long, Long, Long, Long)].collect().head
    // replay: W = 1002; unit 1 crosses (certainty, clamped to 1000 milli);
    val total = 1002L
    var cw = 0L
    val contrib = rows.flatMap { case (_, w) =>
      val prev = cw; cw += w
      if (cw * 2 / total > prev * 2 / total)
        Some(math.max(1000L, 1000L * total / (2L * w)))
      else None
    }
    assert(out._4 === contrib.sum)
    assert(contrib.head === 1000L, "the mega-unit must hit the clamp arm")
  }

  test("stratified k-fold: exact ±1 balance per stratum, deterministic") {
    // 23 rows in stratum A (23 = 4·5+3 → folds sized 5,5,5,4,4),
    // 7 in stratum B (2,2,1,1,1)
    val rows = ((1L to 23L).map(i => (i, "A")) ++ (100L to 106L).map(i => (i, "B")))
      .toDF("id", "s")
    val folded = Sampling.stratifiedKFold(rows, Seq("s"), col("id"), k = 5)
      .select("s", "fold", "id").as[(String, Long, Long)].collect()
    val sizes = folded.groupBy(t => (t._1, t._2)).view.mapValues(_.length).toMap
    assert(sizes.filterKeys(_._1 == "A").values.toSeq.sorted === Seq(4, 4, 5, 5, 5))
    assert(sizes.filterKeys(_._1 == "B").values.toSeq.sorted === Seq(1, 1, 1, 2, 2))
    assert(folded.forall(t => t._2 >= 0 && t._2 < 5))
    // determinism: a second run assigns identical folds
    val again = Sampling.stratifiedKFold(rows, Seq("s"), col("id"), k = 5)
      .select("id", "fold").as[(Long, Long)].collect().toMap
    assert(folded.forall(t => again(t._3) == t._2))
  }

}
