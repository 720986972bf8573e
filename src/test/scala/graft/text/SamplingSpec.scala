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

  test("stratified sample takes exactly perStratum per group") {
    val sample = Sampling.stratifiedSample(docs, Seq("lang"), col("doc_id"), 7)
    val perLang = sample.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.values.forall(_ === 7L))
  }
}
