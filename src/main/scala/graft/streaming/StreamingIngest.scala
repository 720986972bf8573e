package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._

/** Streaming ingest dedup ledger — the per-trigger twin of the batch
  * `incremental_ingest_e2e` composition (O206): production ingest is a
  * stream, and each micro-batch needs the nightly pipeline's verdict at
  * trigger time — how many arrivals were URL-duplicates, exact-text
  * duplicates, near-dup SUSPECTS (cheap screen, verified downstream), or
  * genuinely new.
  *
  * Shape: `foreachBatch` + ONE persistent parquet key index (kind, key) —
  * the [[StreamingNearDup]] state rationale verbatim: per surviving doc the
  * state is O(1) keys (one canonical URL, one text fingerprint, one
  * min-shingle-hash bucket), held as columnar storage touched only by
  * equi-joins, never driver or executor heap; a `flatMapGroupsWithState`
  * formulation would hold the same keys in per-key state stores with more
  * overhead and no batch-job reusability. Within a batch the smallest
  * doc_id of a colliding group wins each stage — with the replay source's
  * id-monotone file order, "seen in the index OR a smaller id in this
  * batch" is exactly "a smaller-id qualifying doc exists anywhere", which
  * is what makes the ledger oracle-replayable as plain window minima over
  * the deterministic batch slicing (rn div ceil(n/numBatches)).
  *
  * Stages are sequential filters, so each stage's within-batch minimum is
  * taken over the PREVIOUS stage's survivors only (a URL-duplicate must
  * not claim text-fingerprint priority). The near-dup screen key is the
  * minimum md5-based 3-token-shingle hash (minhash with one seed): docs
  * sharing most shingles collide with high probability, engine-portable by
  * the md5Bits60 ⟷ DuckDB md5-prefix identity — the repo-wide rule that
  * oracled values never ride xxhash.
  *
  * At-least-once note: a batch replayed after a crash between the ledger
  * append and the index append re-emits its ledger row — the contract of
  * every foreachBatch sink (see [[StreamingNearDup]]); idempotent sinks are
  * the caller's transactional concern, same as the reference's ack model.
  */
object StreamingIngest {

  /** Run the bounded ingest stream and return its per-trigger ledger:
    * (batch_id, batch_in, url_dups, exact_dups, neardup_suspects,
    * new_docs) — one row per micro-batch (an empty trigger's global
    * aggregate still emits a batch_in=0 row; a replay source with NO
    * triggers at all yields an empty ledger).
    *
    * @param stream streaming frame carrying `idCol` (long, id-monotone in
    *               replay order), `urlCol` (canonical URL), `fpCol` (exact
    *               text fingerprint), `bkCol` (near-dup screen key)
    */
  def ingestLedger(stream: DataFrame, idCol: String, urlCol: String,
                   fpCol: String, bkCol: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_ingest")
    val idxPath = root.resolve("index").toString
    val ledgerPath = root.resolve("ledger").toString
    val ckpt = root.resolve("ckpt").toString
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // bk is cast to string HERE, not at the index append: the index
        // stores all three kinds in one string key column, and joining a
        // long batch column against the stored string key would rest on
        // implicit cross-type coercion — exact under ANSI, but DOUBLE under
        // ANSI-off coercion, where 60-bit hash keys lose precision past
        // 2^53 and distinct buckets could silently compare equal (r14
        // advice). An explicit string=string equi-join has no coercion.
        val b = batch.select(
          col(idCol).cast("long").as("id"),
          col(urlCol).as("url_c"), col(fpCol).as("fp"),
          col(bkCol).cast("string").as("bk"))
        // "no index yet" (first batch) vs a genuine read failure must stay
        // distinguishable — swallowing the latter would skip every vs-index
        // check and report dups as new (the StreamingNearDup lesson)
        val idxHadoop = new org.apache.hadoop.fs.Path(idxPath)
        val fs = idxHadoop.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // ONE index read + ONE (kind, key) distinct per trigger, persisted:
        // the three stage lookups are consumed by BOTH trigger actions
        // (ledger aggregate + index append), so an unpersisted index would
        // be re-read and re-deduplicated six times per trigger. distinct()
        // itself is load-bearing, not hygiene: the lookups below are LEFT
        // joins with a marker column (so the flags stay row-aligned), and a
        // duplicated index key would MULTIPLY matching arrival rows —
        // batch_in itself would over-count. The append path also never
        // re-appends a present key (see below), so this is belt-and-braces.
        val seen: Option[DataFrame] =
          if (fs.exists(idxHadoop))
            Some(spark.read.parquet(idxPath).distinct().persist())
          else None
        def seenKeys(kind: String, as: String) = seen
          .map(_.filter(col("kind") === kind).select(col("key").as(as)))
          .getOrElse(spark.createDataFrame(
            java.util.Collections.emptyList[Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(as,
                org.apache.spark.sql.types.StringType)))))
        // stage 1: canonical-URL first-seen over ALL arrivals
        val minUrl = b.groupBy(col("url_c")).agg(min(col("id")).as("__umin"))
        val u = b
          .join(seenKeys("url", "url_c").withColumn("__us", lit(1)),
            Seq("url_c"), "left")
          .join(minUrl, Seq("url_c"))
          .withColumn("url_dup",
            col("__us").isNotNull || col("id") > col("__umin"))
        // stage 2: exact-fingerprint first-seen over URL survivors only
        val minFp = u.filter(!col("url_dup"))
          .groupBy(col("fp")).agg(min(col("id")).as("__fmin"))
        val e = u
          .join(seenKeys("fp", "fp").withColumn("__fs", lit(1)), Seq("fp"), "left")
          .join(minFp, Seq("fp"), "left")
          .withColumn("exact_dup", !col("url_dup") &&
            (col("__fs").isNotNull || col("id") > col("__fmin")))
        // stage 3: near-dup SUSPECT screen over exact survivors (suspects
        // are still ingested — their keys enter the index — pending the
        // heavy verification downstream)
        val surv = !col("url_dup") && !col("exact_dup")
        val minBk = e.filter(surv).groupBy(col("bk")).agg(min(col("id")).as("__bmin"))
        val s = e
          .join(seenKeys("bk", "bk").withColumn("__bs", lit(1)), Seq("bk"), "left")
          .join(minBk, Seq("bk"), "left")
          .withColumn("suspect", surv &&
            (col("__bs").isNotNull || col("id") > col("__bmin")))
          .persist() // two consumers below: the ledger row + the index append
        try {
          s.agg(
            count(lit(1)).as("batch_in"),
            sum(when(col("url_dup"), 1L).otherwise(0L)).as("url_dups"),
            sum(when(col("exact_dup"), 1L).otherwise(0L)).as("exact_dups"),
            sum(when(col("suspect"), 1L).otherwise(0L)).as("neardup_suspects"),
            sum(when(surv && !col("suspect"), 1L).otherwise(0L)).as("new_docs"))
            .select(lit(batchId).as("batch_id"), col("batch_in"),
              col("url_dups"), col("exact_dups"), col("neardup_suspects"),
              col("new_docs"))
            .write.mode(SaveMode.Append).parquet(ledgerPath)
          // ONE index append per trigger: only NEWLY-claimed keys, so the
          // index never holds a key twice (the left-join lookups above would
          // otherwise multiply later arrivals). url keys come from URL
          // winners (a url hit makes every later same-url doc url_dup —
          // never re-appended); fp keys from survivors (an fp hit makes the
          // doc exact_dup — excluded); bk keys from NON-SUSPECT survivors
          // only — a suspect's bk is by definition already indexed, and
          // re-appending it would double-count every later arrival of that
          // bucket through the left-join lookup (r14 review finding).
          // distinct() covers in-batch re-claims.
          s.filter(!col("url_dup"))
            .select(lit("url").as("kind"), col("url_c").as("key"))
            .unionByName(s.filter(surv)
              .select(lit("fp").as("kind"), col("fp").as("key")))
            .unionByName(s.filter(surv && !col("suspect"))
              .select(lit("bk").as("kind"), col("bk").as("key")))
            .distinct()
            .write.mode(SaveMode.Append).parquet(idxPath)
        } finally {
          s.unpersist()
          seen.foreach(_.unpersist())
          ()
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    StreamingRouter.awaitBounded(q)
    // the ledger is answer-sized BY CONSTRUCTION (one row per trigger), so
    // localize it (the drainMemoryToLocal precedent) and delete the whole
    // temp tree EAGERLY — deleteOnExit would hold a full index + checkpoint
    // copy per invocation (Verify + two bench passes + PlanAudit = 4 copies)
    // for the JVM lifetime (r14 review finding)
    val spark = stream.sparkSession
    // zero-trigger streams never write the ledger parquet — return an
    // empty typed frame instead of a path-not-found error (r14 advice)
    val ledgerSchema = org.apache.spark.sql.types.StructType(
      Seq("batch_id", "batch_in", "url_dups", "exact_dups",
        "neardup_suspects", "new_docs").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.LongType)))
    val ledgerHadoop = new org.apache.hadoop.fs.Path(ledgerPath)
    val ledgerFs = ledgerHadoop.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val local =
      if (!ledgerFs.exists(ledgerHadoop))
        spark.createDataFrame(
          java.util.Collections.emptyList[Row](), ledgerSchema)
      else {
        val t = spark.read.parquet(ledgerPath)
        spark.createDataFrame(
          java.util.Arrays.asList(t.collect(): _*), t.schema)
      }
    val walk = java.nio.file.Files.walk(root)
    try {
      walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    } finally walk.close()
    local
  }
}
