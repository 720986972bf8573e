package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the alignment-filter detection gate: the stub plants mismatches at
  * id ≡ 3 (mod 10), and the 900-milli filter must recover EXACTLY that set
  * — no more (matched pairs always keep), no fewer (planted pairs of
  * unrelated vectors must score below threshold).
  */
class AlignmentFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("stub plants mismatches exactly at id % 10 == 3, wrapping at n") {
    val img = AlignmentFilter.imageEmbeddingStub(emb, "vec_id", "v")
    val n = emb.count()
    val joined = img.join(emb.select(col("vec_id"), col("v").as("tv")),
      col("id") === col("vec_id"))
    // planted rows carry a DIFFERENT vector; matched rows the identical one
    val diff = joined.filter(col("img_v") =!= col("tv"))
      .select(col("id")).as[Long].collect().toSet
    assert(diff === (0L until n).filter(_ % 10 == 3).toSet)
  }

  test("degenerate fixtures (n <= 7) refuse loudly instead of planting no-ops") {
    // n = 7: (id+7) mod 7 == id — every "planted" row would carry its own
    // embedding and the detection gate silently becomes vacuous
    val tiny = emb.limit(7)
    val e = intercept[Exception] {
      AlignmentFilter.imageEmbeddingStub(tiny, "vec_id", "v").count()
    }
    assert(e.getMessage.contains("degenerates"))
  }

  test("the 900-milli filter recovers exactly the planted set") {
    val img = AlignmentFilter.imageEmbeddingStub(emb, "vec_id", "v")
    val pairs = emb.join(img, col("vec_id") === col("id"))
      .withColumn("g", lit("all"))
    val flagged = pairs
      .withColumn("a", floor(graft.vector.VectorFunctions
        .cosine(col("v"), col("img_v")) * lit(1000.0)).cast("long"))
      .filter(col("a") < 900L).select(col("vec_id")).as[Long].collect().toSet
    val n = emb.count()
    assert(flagged === (0L until n).filter(_ % 10 == 3).toSet,
      "filter must flag the planted mismatches and nothing else")
    val led = AlignmentFilter.ledger(pairs, "vec_id", "g",
      col("v"), col("img_v"), 900L)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(led._2 === n)
    assert(led._4 === flagged.size.toLong)
    assert(led._5 === flagged.sum)
    assert(led._3 + led._4 === n)
  }
}
