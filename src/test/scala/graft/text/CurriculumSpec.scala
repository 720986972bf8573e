package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("stride interleave: quality-first per source, balanced globally") {
    val docs = Seq(
      (1L, "A", 30L), (2L, "A", 20L), (3L, "A", 10L),
      (4L, "B", 5L), (5L, "B", 50L))
      .toDF("doc_id", "source", "score")
    val out = Curriculum.strideInterleave(docs, "doc_id", "source", col("score"))
      .select("doc_id", "source", "rank_in_source", "global_pos")
      .as[(Long, String, Long, Long)].collect().sortBy(_._4)
    assert(out.toSeq === Seq(
      (1L, "A", 1L, 0L), (5L, "B", 1L, 1L),
      (2L, "A", 2L, 2L), (4L, "B", 2L, 3L),
      (3L, "A", 3L, 4L)))
  }

  test("score ties break on id ascending; positions are unique") {
    val docs = Seq(
      (9L, "A", 7L), (2L, "A", 7L), (5L, "B", 7L), (6L, "B", 7L))
      .toDF("doc_id", "source", "score")
    val out = Curriculum.strideInterleave(docs, "doc_id", "source", col("score"))
      .select("doc_id", "global_pos").as[(Long, Long)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq === Seq(2L, 5L, 9L, 6L))
    assert(out.map(_._2).distinct.length === 4)
  }

  test("a source column above the maxSources cap fails loudly, not OOM") {
    // doc_id passed as the "source": high-cardinality by construction —
    // the bounded-collect contract must refuse it before collecting
    val docs = (1L to 30L).map(i => (i, s"src$i", i)).toDF("doc_id", "source", "score")
    val e = intercept[IllegalArgumentException] {
      Curriculum.strideInterleave(docs, "doc_id", "source", col("score"),
        maxSources = 10)
    }
    assert(e.getMessage.contains("maxSources"))
  }

  test("first S positions hold exactly one doc per source (sf fixture)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val nSrc = docs.select("source").distinct().count()
    val head = Curriculum.strideInterleave(docs, "doc_id", "source", col("n_chars"))
      .filter(col("global_pos") < nSrc)
      .select("source").as[String].collect()
    assert(head.length === nSrc && head.distinct.length === nSrc)
  }
}
