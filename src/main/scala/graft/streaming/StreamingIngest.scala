package graft.streaming

import org.apache.spark.sql.{DataFrame, Observation, Row, SaveMode}
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
  * Trigger cost (r15, guide §1/§2.4): ONE distributed job per trigger —
  * the index append — with the ledger aggregate riding the same job as
  * `observe` metrics and the three per-kind key arms fused into one
  * conditional-array explode over one pass of the flagged batch. The r14
  * shape ran three jobs per trigger (ledger aggregate + one-row ledger
  * parquet append, index read + re-distinct, index append) plus a final
  * whole-ledger read; measured at sf0.1/32 cores the row dropped ~2×.
  *
  * At-least-once note: a batch replayed after a crash between the ledger
  * emission and the index append re-emits its ledger row — the contract of
  * every foreachBatch sink (see [[StreamingNearDup]]); idempotent sinks are
  * the caller's transactional concern, same as the reference's ack model.
  * The ledger row itself is localized at the trigger (it is answer-sized:
  * six longs per trigger); a deployment that needs it durable appends it to
  * its transactional sink inside the trigger, keyed by batch_id.
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
    val ckpt = root.resolve("ckpt").toString
    // Driver-held ledger buffer, answer-sized BY CONSTRUCTION: ONE 6-long
    // row per trigger. The r14 shape appended each row as a one-row parquet
    // job and read the whole ledger back after the drain — one distributed
    // job per trigger plus one per invocation, for rows the function
    // localizes anyway (the drainMemoryToLocal precedent). The row now
    // rides the index-append job as observed metrics and lands here; a
    // deployment that needs the ledger durable appends the same 6-field row
    // to its transactional sink inside the trigger (idempotent by
    // batch_id) — a sink contract, not a distributed job.
    val ledgerRows = new scala.collection.mutable.ArrayBuffer[Row]()
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
        // check and report dups as new (the StreamingNearDup lesson).
        // ONE lazy index read per trigger, persisted: the three stage
        // lookups below read it, and the parquet-rooted plan keeps the real
        // file-size statistics, so the planner broadcasts the lookup side
        // while the index is small and falls back to shuffled equi-joins
        // when it is not — a lineage-truncated cross-trigger cache
        // (localCheckpoint/LogicalRDD) was measured 2× SLOWER here because
        // its default statistics force every lookup to sort-merge (r15).
        // No distinct() on the read (r15): the append path below never
        // appends a key the index already holds and each kind's in-batch
        // winners are unique by the min-id rule, so index keys are unique
        // BY CONSTRUCTION — the r14 belt-and-braces re-dedup was a full
        // extra shuffle per trigger of provably-unique rows (its guard
        // value is covered by the newKeys distinct(), which stays; the
        // invariant itself is pinned by StreamingIngestSpec's cross-batch
        // collision replay). The uniqueness additionally ASSUMES each
        // append commits atomically (true of Spark's parquet commit
        // protocol on a real filesystem, as here); a durable-index
        // deployment on a direct-commit/cloud committer where a crashed
        // append can leave partial files must restore the read-side
        // distinct() or vacuum before restart (r15 advice).
        val idxHadoop = new org.apache.hadoop.fs.Path(idxPath)
        val fs = idxHadoop.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val seen: Option[DataFrame] =
          if (fs.exists(idxHadoop)) Some(spark.read.parquet(idxPath).persist())
          else None
        def seenKeys(kind: String, as: String) = seen
          .map(_.filter(col("kind") === kind).select(col("key").as(as)))
          .getOrElse(spark.createDataFrame(
            java.util.Collections.emptyList[Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(as,
                org.apache.spark.sql.types.StringType)))))
        // The three sequential first-seen stages as WINDOW MINIMA — the
        // exact formulation the oracle replays ("plain window minima over
        // the deterministic batch slicing"). The r14 shape computed each
        // stage as a groupBy-min aggregate joined back, which cost an
        // aggregate exchange + a broadcast build + a join PER STAGE; a
        // conditional min over a partition window is one exchange per
        // stage, and the stage conditions (url survivor, exact survivor)
        // ride as CASE inside the min exactly like the oracle's
        // MIN(CASE WHEN ... THEN doc_id END) OVER (PARTITION BY ...).
        // The three index lookups are key-disjoint left equi-joins of the
        // batch, so they all happen up front.
        val withSeen = b
          .join(seenKeys("url", "url_c").withColumn("__us", lit(1)),
            Seq("url_c"), "left")
          .join(seenKeys("fp", "fp").withColumn("__fs", lit(1)), Seq("fp"), "left")
          .join(seenKeys("bk", "bk").withColumn("__bs", lit(1)), Seq("bk"), "left")
        val wUrl = org.apache.spark.sql.expressions.Window.partitionBy(col("url_c"))
        val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
        val wBk = org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))
        // stage 1: canonical-URL first-seen over ALL arrivals
        // stage 2: exact-fingerprint first-seen over URL survivors only
        // stage 3: near-dup SUSPECT screen over exact survivors (suspects
        // are still ingested — their keys enter the index — pending the
        // heavy verification downstream)
        val surv = !col("url_dup") && !col("exact_dup")
        val s = withSeen
          .withColumn("url_dup",
            col("__us").isNotNull || col("id") > min(col("id")).over(wUrl))
          .withColumn("exact_dup", !col("url_dup") &&
            (col("__fs").isNotNull ||
              col("id") > min(when(!col("url_dup"), col("id"))).over(wFp)))
          .withColumn("suspect", surv &&
            (col("__bs").isNotNull ||
              col("id") > min(when(surv, col("id"))).over(wBk)))
        try {
          // The per-trigger ledger row rides the index-append job as
          // OBSERVED metrics (CollectMetrics sits above the flagged rows
          // and below the key explode, so every flagged row is metered
          // exactly once; the optimizer never pushes filters through a
          // CollectMetrics barrier) — no separate aggregate job, and `s`
          // now has ONE consumer so it no longer needs persist().
          // Retry caveat (r15 advice): the CollectMetrics node sits below
          // the append's distinct() exchange, i.e. in a shuffle-map stage,
          // where accumulator updates lack the result-stage exactly-once
          // guarantee — a stage RETRY (executor loss) or a speculative
          // duplicate task can double-count the observed sums. Local
          // AvailableNow triggers never retry; a production deployment that
          // needs the ledger exact under failure recomputes the row from
          // the appended index delta (a second, deterministic job — the r14
          // shape) or disables speculation for the ingest job group.
          val obs = Observation(s"ingest_ledger_$batchId")
          val sObs = s.observe(obs,
            count(lit(1)).as("batch_in"),
            sum(when(col("url_dup"), 1L).otherwise(0L)).as("url_dups"),
            sum(when(col("exact_dup"), 1L).otherwise(0L)).as("exact_dups"),
            sum(when(col("suspect"), 1L).otherwise(0L)).as("neardup_suspects"),
            sum(when(surv && !col("suspect"), 1L).otherwise(0L)).as("new_docs"))
          // ONE index append per trigger: only NEWLY-claimed keys, so the
          // index never holds a key twice (the left-join lookups above would
          // otherwise multiply later arrivals). url keys come from URL
          // winners (a url hit makes every later same-url doc url_dup —
          // never re-appended); fp keys from survivors (an fp hit makes the
          // doc exact_dup — excluded); bk keys from NON-SUSPECT survivors
          // only — a suspect's bk is by definition already indexed, and
          // re-appending it would double-count every later arrival of that
          // bucket through the left-join lookup (r14 review finding).
          // distinct() covers in-batch re-claims. The three per-kind arms
          // are ONE conditional-array explode — one pass over the flagged
          // rows instead of the r14 three-filter union (three passes).
          sObs
            .select(explode(array(
              when(!col("url_dup"),
                struct(lit("url").as("kind"), col("url_c").as("key"))),
              when(surv,
                struct(lit("fp").as("kind"), col("fp").as("key"))),
              when(surv && !col("suspect"),
                struct(lit("bk").as("kind"), col("bk").as("key"))))).as("e"))
            .filter(col("e").isNotNull)
            .select(col("e.kind").as("kind"), col("e.key").as("key"))
            .distinct()
            .write.mode(SaveMode.Append).parquet(idxPath)
          val m = obs.get
          // observed sum(...) over an EMPTY trigger is null (only count is
          // 0) — coalesce so an empty micro-batch yields an all-zero ledger
          // row rather than nulls (r15 advice; AvailableNow over the replay
          // source never fires one, but the contract shouldn't rely on it)
          def z(v: Any): Any = if (v == null) Long.box(0L) else v
          ledgerRows += Row(Long.box(batchId), m("batch_in"), z(m("url_dups")),
            z(m("exact_dups")), z(m("neardup_suspects")), z(m("new_docs")))
        } finally {
          seen.foreach(_.unpersist())
          ()
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    StreamingRouter.awaitBounded(q)
    val spark = stream.sparkSession
    // the ledger is answer-sized BY CONSTRUCTION (one row per trigger) and
    // was localized AT the trigger; a zero-trigger stream simply leaves the
    // buffer empty (r14 advice: no path-not-found on an empty replay).
    // Delete the whole temp tree EAGERLY — deleteOnExit would hold a full
    // index + checkpoint copy per invocation (Verify + two bench passes +
    // PlanAudit = 4 copies) for the JVM lifetime (r14 review finding).
    val ledgerSchema = org.apache.spark.sql.types.StructType(
      Seq("batch_id", "batch_in", "url_dups", "exact_dups",
        "neardup_suspects", "new_docs").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.LongType)))
    val local = spark.createDataFrame(
      java.util.Arrays.asList(ledgerRows.toSeq: _*), ledgerSchema)
    val walk = java.nio.file.Files.walk(root)
    try {
      walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    } finally walk.close()
    local
  }
}
