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
