package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** SimHash (Charikar) 64-bit near-dup fingerprints, DataFrame-only.
  *
  * simhash(doc) = one 64-bit word whose bit i is the sign of
  * Σ_tokens (±1 depending on bit i of xxhash64(token)). Documents are
  * near-duplicates when the Hamming distance of their simhashes is small.
  *
  * Shape chosen for scale (same reasoning as [[MinHash]]): explode to
  * (doc, token) rows, one codegen'd hash per token, then 64 `sum(±1)`
  * aggregate columns in a single groupBy — fully inside WholeStageCodegen
  * with map-side partial aggregation. No interpreted HOF lambdas.
  */
object SimHash {

  /** (id, fp) fingerprints. Docs with no tokens drop out. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    hashed.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ bitwiseOR _).as("fp"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup candidate pairs by banding the 64-bit fingerprint into 4
    * 16-bit blocks (Hamming ≤ 3 ⇒ at least one block equal — pigeonhole).
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol)
    val blocks = fp.select(col("id"), col("fp"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("block"),
          shiftright(col("fp"), i * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("b"))
      .select(col("id"), col("fp"), col("b.block"), col("b.key"))
    val a = blocks.select(col("block"), col("key"), col("id").as("id1"), col("fp").as("fp1"))
    val b = blocks.select(col("block"), col("key"), col("id").as("id2"), col("fp").as("fp2"))
    a.join(b, Seq("block", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), hamming(col("fp1"), col("fp2")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
