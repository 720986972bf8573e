package graft.queries

import org.apache.spark.sql.functions._
import Dsl._

/** Round-8 audit wave: spectral/feature statistics and corpus-analysis
  * operators that report on the data rather than transform it — the
  * dashboard layer over the engine's curation surface.
  */
object AuditQueries {

  val queries: Seq[DeclaredQuery] = Seq(

    // ---- O75: exact embedding Gram matrix ----------------------------------
    // The sufficient statistic every spectral feature audit starts from
    // (PCA/whitening input; covariance = (n·G − s·sᵀ)/n² with the per-dim
    // sums the dispersion family already emits; dead dims = zero diagonal,
    // redundant dims = off-diagonal mass). A custom typed Aggregator
    // accumulates all d(d+1)/2 upper-triangle sums in one flat long buffer
    // per partition (fused multiply-adds, no per-cell explode) — the only
    // shuffled state is a d²/2-long array per partition whatever the row
    // count. Quantized-exact (floor(x·10⁴) longs) so every cell
    // hash-matches.
    DeclaredQuery("embedding_gram_matrix",
      (s, dir) => graft.vector.Gram
        .upperTriangle(tbl(s, dir, "embeddings"), "embedding", dim = 64)
        .orderBy(col("dim_i"), col("dim_j")),
      Some("""WITH e AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * 10000) AS BIGINT)) AS q FROM embeddings),
        pos AS (SELECT unnest(range(1, 65)) AS i),
        p AS (SELECT a.i AS i, b.i AS j, q[a.i] * q[b.i] AS prod
              FROM e CROSS JOIN pos a CROSS JOIN pos b WHERE a.i <= b.i)
        SELECT CAST(i - 1 AS BIGINT) AS dim_i, CAST(j - 1 AS BIGINT) AS dim_j,
          COUNT(*) AS n, CAST(SUM(prod) AS BIGINT) AS gram
        FROM p GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- O75b: dominant principal direction by integer power iteration -----
    // PCA's first step over the SAME landed Gram stage: 4 power-iteration
    // rounds in exact integer arithmetic (BigInt matrix-vector on the
    // driver over the collected d²-cell matrix — the bounded-model-collect
    // class; truncating 10⁶·w div max|w| rescale each round), so the
    // direction estimate is engine-replayable digit for digit. The oracle
    // replays all four rounds as chained CTEs in HUGEINT.
    DeclaredQuery("gram_power_iteration",
      (s, dir) => graft.vector.Gram
        .powerIteration(tbl(s, dir, "embeddings"), "embedding", dim = 64,
          rounds = 4)
        .orderBy(col("dim")),
      Some {
        val roundCtes = (1 to 4).map { r =>
          val prev = s"v${r - 1}"
          s"""w$r AS (SELECT gf.gi AS i, CAST(SUM(g * v.v) AS HUGEINT) AS w
               FROM gf JOIN $prev v ON v.i = gf.gj GROUP BY 1),
          m$r AS (SELECT MAX(ABS(w)) AS m FROM w$r),
          v$r AS (SELECT i, (1000000 * w) // m AS v FROM w$r CROSS JOIN m$r)"""
        }.mkString(",\n        ")
        s"""WITH e AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * 10000) AS BIGINT)) AS q FROM embeddings),
        pos AS (SELECT unnest(range(1, 65)) AS i),
        p AS (SELECT a.i AS i, b.i AS j, q[a.i] * q[b.i] AS prod
              FROM e CROSS JOIN pos a CROSS JOIN pos b WHERE a.i <= b.i),
        gc AS (SELECT i - 1 AS gi, j - 1 AS gj, CAST(SUM(prod) AS HUGEINT) AS g
               FROM p GROUP BY 1, 2),
        gf AS (SELECT gi, gj, g FROM gc
               UNION ALL SELECT gj, gi, g FROM gc WHERE gi <> gj),
        v0 AS (SELECT unnest(range(0, 64)) AS i, CAST(1000000 AS HUGEINT) AS v),
        $roundCtes
        SELECT CAST(v4.i AS BIGINT) AS dim, CAST(v4.v AS BIGINT) AS v_micro,
          CAST(m4.m AS VARCHAR) AS growth
        FROM v4 CROSS JOIN m4 ORDER BY dim"""
      }),

    // ---- O76: PMI collocation mining ----------------------------------------
    // Church–Hanks pointwise mutual information over bigrams, ranked by the
    // exact-integer lift permille (1000 = independence) with a support
    // floor — the phrase-mining pass that decides which multi-word units a
    // tokenizer budget should treat as one symbol. The oracle rebuilds
    // bigrams with the gopher-oracle LEAD-window road and must land on the
    // identical top-20.
    DeclaredQuery("pmi_top_pairs",
      (s, dir) => graft.text.Collocations
        .pmiTopPairs(tbl(s, dir, "documents"), "doc_id", "text",
          minCount = 5L, topK = 20),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t,
               generate_subscripts(string_split(text, ' '), 1) AS pos FROM documents),
        u AS (SELECT t, CAST(COUNT(*) AS HUGEINT) AS c FROM tok GROUP BY 1),
        l AS (SELECT doc_id, t, LEAD(t, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1 FROM tok),
        b AS (SELECT t AS x, t1 AS y, CAST(COUNT(*) AS HUGEINT) AS c_xy
              FROM l WHERE t1 IS NOT NULL GROUP BY 1, 2),
        tu AS (SELECT CAST(SUM(c) AS HUGEINT) AS t_u FROM u),
        tb AS (SELECT CAST(SUM(c_xy) AS HUGEINT) AS t_b FROM b)
        SELECT x, y, CAST(c_xy AS BIGINT) AS c_xy,
          CAST(ux.c AS BIGINT) AS c_x, CAST(uy.c AS BIGINT) AS c_y,
          CAST((1000 * c_xy * t_u * t_u) // (t_b * ux.c * uy.c) AS BIGINT) AS lift_permille
        FROM b JOIN u ux ON ux.t = b.x JOIN u uy ON uy.t = b.y
        CROSS JOIN tu CROSS JOIN tb
        WHERE c_xy >= 5
        ORDER BY lift_permille DESC, c_xy DESC, x, y LIMIT 20""")),

    // ---- O78: incremental IVF cell assignment ------------------------------
    // Index MAINTENANCE, not rebuild: freeze the cells of the id<250
    // snapshot (Similarity.lowestIdSeeds — the same deterministic coarse
    // quantizer ivf_topk uses) and assign the NEW batch to them with the
    // standalone assignCells (shuffle-free literal-seed cosines). Emits the
    // per-cell occupancy ledger old vs new plus the proportional-growth
    // multiple (1000 = the cell grew exactly in line with the batch) — the
    // drift signal that decides when re-training the quantizer is due.
    DeclaredQuery("ivf_incremental_assign",
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        val seeds = graft.vector.Similarity.lowestIdSeeds(
          emb.filter(col("vec_id") < 250), "vec_id", "embedding", nlist = 16)
        val assigned = graft.vector.Similarity.assignCells(
          emb.withColumn("is_old", col("vec_id") < 250), "embedding", seeds)
        val per = assigned.groupBy(col("cell"))
          .agg(sum(when(col("is_old"), 1L).otherwise(0L)).as("n_old"),
            sum(when(col("is_old"), 0L).otherwise(1L)).as("n_new"))
        val totals = broadcast(per.agg(
          sum(col("n_old")).as("t_old"), sum(col("n_new")).as("t_new")))
        per.crossJoin(totals)
          .withColumn("growth_x_permille",
            expr("(1000L * CAST(n_new AS DECIMAL(38,0)) * t_old) div (n_old * t_new)"))
          .select(col("cell"), col("n_old"), col("n_new"), col("growth_x_permille"))
          .orderBy(col("cell"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        seeds AS (SELECT vec_id AS sid, v AS sv FROM e WHERE vec_id < 250
                  ORDER BY vec_id LIMIT 16),
        ass AS (SELECT vec_id, sid, is_old FROM (
            SELECT e.vec_id, s.sid, e.vec_id < 250 AS is_old,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                list_reduce(list_transform(list_zip(e.v, s.sv), x -> x[1] * x[2]), (a, b) -> a + b)
                / (sqrt(list_reduce(list_transform(list_zip(e.v, e.v), x -> x[1] * x[2]), (a, b) -> a + b))
                 * sqrt(list_reduce(list_transform(list_zip(s.sv, s.sv), x -> x[1] * x[2]), (a, b) -> a + b)))
                DESC, s.sid) AS rn
            FROM e CROSS JOIN seeds s) t WHERE rn = 1),
        per AS (SELECT sid AS cell,
                  CAST(SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS HUGEINT) AS n_old,
                  CAST(SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS HUGEINT) AS n_new
                FROM ass GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_old) AS HUGEINT) AS t_old,
                  CAST(SUM(n_new) AS HUGEINT) AS t_new FROM per)
        SELECT cell, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
          CAST((1000 * n_new * t_old) // (n_old * t_new) AS BIGINT) AS growth_x_permille
        FROM per CROSS JOIN tot ORDER BY cell""")),

    // ---- O82: SQ8 quantization distortion audit ----------------------------
    // The storage-path twin of ivf_recall_audit: recall audits what the
    // INDEX approximation costs, this audits what the int8 STORAGE
    // quantization costs — per-vector reconstruction error on the exact
    // 10⁴ grid ((code·M) div 127 round-trip), worst-10 shortlist + the
    // corpus-wide ppm. Map-only row-local folds; global totals in
    // DECIMAL(38,0) (long crosses 2⁶³ near 10⁹ rows).
    DeclaredQuery("sq8_distortion_audit",
      (s, dir) => graft.vector.QuantError
        .sq8Distortion(tbl(s, dir, "embeddings"), "vec_id", "embedding",
          topK = 10),
      Some("""WITH e AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * 10000) AS BIGINT)) AS q FROM embeddings),
        m AS (SELECT vec_id, q, list_max(list_transform(q, x -> abs(x))) AS mx
              FROM e),
        d AS (SELECT vec_id,
                list_transform(q, x -> x - (((127 * x) // mx) * mx) // 127) AS dl,
                q
              FROM m WHERE mx > 0),
        per AS (SELECT vec_id,
                  list_reduce(list_transform(dl, t -> t * t), (a, b) -> a + b) AS err,
                  list_reduce(list_transform(q, x -> x * x), (a, b) -> a + b) AS energy
                FROM d),
        tot AS (SELECT CAST(SUM(err) AS HUGEINT) AS te,
                  CAST(SUM(energy) AS HUGEINT) AS tn FROM per)
        SELECT vec_id, err, energy,
          CAST((1000000 * err) // energy AS BIGINT) AS dist_ppm,
          CAST((1000000 * te) // tn AS BIGINT) AS global_ppm
        FROM per CROSS JOIN tot
        ORDER BY dist_ppm DESC, vec_id LIMIT 10""")),

    // ---- O79: tokenizer OOV audit ------------------------------------------
    // The vocabulary-budget planning twin of vocab_coverage, read per
    // LANGUAGE: with the top-16 frequency-ranked types as the vocabulary,
    // what token share per language falls out-of-vocabulary — the number
    // that says which languages a shared tokenizer budget is starving.
    // Vocabulary frame is TakeOrdered + broadcast; one corpus-tokenize
    // join with map-side-combined per-lang aggregation.
    DeclaredQuery("tokenizer_oov_audit",
      (s, dir) => {
        val toks = tbl(s, dir, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("t"))
        val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
          .orderBy(desc("c"), col("t")).limit(16)
          .select(col("t"), lit(1L).as("__in"))
        toks.join(broadcast(vocab), Seq("t"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
          .withColumn("oov_permille", expr("(1000L * n_oov) div n_tokens"))
          .orderBy(col("lang"))
      },
      Some("""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents),
        v AS (SELECT t, 1 AS inv FROM (
            SELECT t, COUNT(*) AS c FROM tok GROUP BY 1
            ORDER BY c DESC, t LIMIT 16))
        SELECT lang, COUNT(*) AS n_tokens,
          CAST(SUM(CASE WHEN v.inv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          CAST((1000 * SUM(CASE WHEN v.inv IS NULL THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
            AS oov_permille
        FROM tok LEFT JOIN v USING (t)
        GROUP BY 1 ORDER BY 1"""))
  )
}
