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
  * (doc, token) rows, one codegen'd hash per token, then SWAR-packed bit
  * counts — 16 `sum` aggregate columns, each packing four 16-bit lanes, so
  * the aggregation buffer is 16 longs (not 64) and per-row update work is
  * 16 shift-and-mask adds — fully inside WholeStageCodegen with map-side
  * partial aggregation. No interpreted HOF lambdas.
  *
  * Lane capacity: each 16-bit lane counts one bit position, and keeping the
  * packed long's top lane carry-free bounds a doc at 32 767 *distinct*
  * tokens — far above real documents; beyond that, shard tokens by
  * `pmod(h, s)` into a pre-aggregation level (lane sums add across shards).
  */
object SimHash {

  /** (id, fp) fingerprints. Docs with no tokens drop out. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    // w_j packs the counts of bit positions {j, 16+j, 32+j, 48+j}: masking
    // (h >> j) with 0x0001000100010001 leaves those four bits at lane bases
    // {0,16,32,48}, and summing accumulates each lane independently (no
    // inter-lane carry while every lane stays < 2^16).
    val lane = lit(0x0001000100010001L)
    val laneSums = (0 until 16).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lane)).as(s"w$j")
    }
    val fpExpr =
      // bit i of fp = sign of Σ±1 = [2*ones_i > n], ones_i unpacked from
      // lane i/16 of word w_(i%16)
      (0 until 64).map { i =>
        val ones = shiftright(col(s"w${i % 16}"), 16 * (i / 16)).bitwiseAND(0xFFFFL)
        when(ones * 2 > col("n"), lit(1L << i)).otherwise(0L)
      }.reduce(_ bitwiseOR _)
    hashed.groupBy(col("id")).agg(laneSums.head, laneSums.tail :+ count(lit(1)).as("n"): _*)
      .select(col("id"),
        // lane-capacity contract enforced IN the selected expression (a
        // side column would be pruned): an oversized doc raises an
        // actionable error instead of an ANSI overflow mid-sum (or, with
        // ANSI off, a silently corrupted fingerprint)
        when(col("n") > 32767L,
          raise_error(concat(lit("SimHash: doc "), col("id").cast("string"),
            lit(" has > 32767 distinct tokens; shard tokens by pmod(h, s) first")))
            .cast("long"))
          .otherwise(fpExpr).as("fp"))
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
