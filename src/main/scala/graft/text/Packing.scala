package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing and chunking for training-data assembly.
  *
  * A tokenized corpus is consumed by trainers in fixed-size sequences; the
  * two standard layouts are (a) PACKING — concatenate documents in a stable
  * global order and cut the stream every `budget` tokens, so every training
  * sequence is full — and (b) CHUNKING — split each long document into
  * overlapping windows (the RAG / long-context layout).
  */
object Packing {

  /** Assign each document to the pack chunk its FIRST token lands in, under
    * a stable global order (`idCol`): chunk_id = floor(start_offset/budget).
    *
    * The global running token offset does NOT use a global-order window (a
    * single-partition sort at 100 TB) — it is a
    * [[graft.relational.PrefixSum.runningSum]] two-phase distributed prefix
    * sum over deterministic id-range buckets: no RangePartitioner sampling,
    * no `localCheckpoint` materialization, lineage-safe, and `numParts`
    * steers parallelism without ever changing an offset.
    *
    * @param tokens strictly-positive integer token-count column
    * @return input columns + (n_tokens, start_offset, chunk_id)
    */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
                    budget: Long, numParts: Int = 32): DataFrame = {
    require(budget > 0)
    val base = df.withColumn("n_tokens", tokens.cast("long"))
    val (summed, _) = graft.relational.PrefixSum.runningSum(
      base, idCol, "n_tokens", "__cw", numParts)
    summed
      .withColumn("start_offset", col("__cw") - col("n_tokens"))
      .withColumn("chunk_id", expr(s"start_offset div $budget"))
      .drop("__cw")
  }

  /** Split each document into overlapping token windows of `size` tokens
    * every `stride` tokens (the last chunk may be short; a doc of up to
    * `size` tokens is one chunk). Pure per-row integer math + a bounded
    * `sequence` explode — embarrassingly parallel, no shuffle at all.
    *
    * @return input columns + (n_tokens, chunk_idx, start_tok, end_tok)
    */
  def chunkWithOverlap(df: DataFrame, tokens: Column,
                       size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size)
    df
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("__nc",
        expr(s"case when n_tokens <= $size then 1L " +
          s"else 1L + (n_tokens - $size + ${stride - 1}) div $stride end"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("__nc") - 1)))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .withColumn("end_tok", least(col("start_tok") + size, col("n_tokens")))
      .drop("__nc")
  }

  /** Length-bucketed batch assembly (the bucketed-batching layout): route
    * each document to the smallest power-of-two `ladder` rung holding its
    * token count (longer docs share the top rung), rank docs within each
    * bucket in stable `idCol` order, and cut fixed-`batchSize` batches from
    * each bucket — so every batch pads only to its own max length instead of
    * the corpus max. The in-bucket rank is a
    * [[graft.relational.PrefixSum.groupedRunningSum]] two-phase distributed
    * prefix sum (ladder rungs are FEW and HUGE — a per-bucket window would
    * serialize each rung into one task; the grouped prefix sum keeps
    * `numParts`-way parallelism inside every rung).
    *
    * @return input columns + (n_tokens, bucket, batch_id, pos_in_batch)
    */
  def lengthBucketBatches(df: DataFrame, idCol: String, tokens: Column,
                          batchSize: Int,
                          ladder: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024),
                          numParts: Int = 32): DataFrame = {
    // strictly-increasing POSITIVE rungs: zero/negative rungs would bucket
    // everything into a degenerate cell and duplicates would alias buckets
    require(batchSize > 0 && ladder.nonEmpty && ladder.head > 0 &&
      ladder == ladder.distinct.sorted,
      s"ladder must be strictly-increasing positive rungs, got $ladder")
    val base = df.withColumn("n_tokens", tokens.cast("long"))
    val bucket = ladder.init.foldRight(lit(ladder.last.toLong)) { (rung, acc) =>
      when(col("n_tokens") <= rung, lit(rung.toLong)).otherwise(acc)
    }
    val ranked = graft.relational.PrefixSum.groupedRunningSum(
      base.withColumn("bucket", bucket).withColumn("__one", lit(1L)),
      "bucket", idCol, "__one", "__rk", numParts)
    ranked
      .withColumn("batch_id", expr(s"(__rk - 1L) div $batchSize"))
      .withColumn("pos_in_batch", expr(s"(__rk - 1L) % $batchSize"))
      .drop("__one", "__rk")
  }

  /** Per-group token-budget quota: within each `groupCol`, walk rows in
    * `idCol` order and keep rows while the running token sum stays within
    * `budget` (per-source caps in corpus mixing). One window pass per group
    * partition — parallel across groups, which is the cardinality that
    * matters at scale.
    *
    * @return (groupCol, n_docs, n_kept, tokens_kept)
    */
  def groupTokenBudget(df: DataFrame, groupCol: String, idCol: String,
                       tokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    df
      .withColumn("__n", tokens.cast("long"))
      .withColumn("__cw", sum(col("__n")).over(w))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__cw") <= budget, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__cw") <= budget, col("__n")).otherwise(0L)).as("tokens_kept"))
  }
}
