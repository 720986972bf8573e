package graft.queries

import org.apache.spark.sql.functions._
import Dsl._

/** Round-6 corpus-curation additions: Gopher repetition rules (O37),
  * eval-benchmark n-gram decontamination (O38), k-center greedy coreset
  * selection (O39), and per-class embedding outliers (O40). All four are
  * integer-exact pipelines (permille divisions, quantized distances), so
  * every compared column hash-matches DuckDB bit-for-bit.
  */
object CorpusQueries {

  /** 8-gram decontamination window — the LEAD chain the oracle uses to
    * mirror the row-local gram construction.
    */
  private val dk = 8
  private val dkLeads: String =
    (1 until dk).map(i => s"LEAD(t, $i) OVER w AS t$i").mkString(", ")
  private val dkGram: String =
    "t || ' ' || " + (1 until dk).map(i => s"t$i").mkString(" || ' ' || ")

  /** The per-train-doc 8-gram contamination report, LANDED once per session
    * and shared by `decontaminate_ngram_overlap` (reads it whole) and
    * `decontamination_verdict` (fuses its flag with the embedding arm) —
    * identical plan on both call sites, so `Stages.materialize`'s plan-keyed
    * memo lands it once.
    */
  private def ngramReport(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame =
    graft.relational.Stages.materialize(
      graft.text.Decontaminate.report(tbl(s, dir, "documents"),
        "doc_id", "text", dk, col("doc_id") % 10 === 7, flagPermille = 200),
      "decontam_report")

  /** The k-center greedy trajectory replayed as chained CTEs: c1 = farthest
    * from origin; m_r = running min-dist after r picks; c_{r+1} = argmax.
    */
  private def coresetOracle(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH e AS MATERIALIZED (
        SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS q
        FROM embeddings),
      n0 AS (SELECT vec_id, SUM(q*q) AS d FROM e GROUP BY 1),
      c1 AS MATERIALIZED (SELECT vec_id, d FROM n0 ORDER BY d DESC, vec_id LIMIT 1),
      m1 AS MATERIALIZED (SELECT e.vec_id, SUM((e.q - ce.q)*(e.q - ce.q)) AS d
             FROM e JOIN e ce ON ce.dim = e.dim
               AND ce.vec_id = (SELECT vec_id FROM c1)
             GROUP BY 1)"""
    for (r <- 2 to k) {
      val prev = (1 until r).map(i => s"SELECT vec_id FROM c$i").mkString(" UNION ALL ")
      sb ++= s""",
      c$r AS MATERIALIZED (SELECT vec_id, d FROM m${r - 1}
              WHERE vec_id NOT IN ($prev)
              ORDER BY d DESC, vec_id LIMIT 1)"""
      if (r < k) sb ++= s""",
      m$r AS MATERIALIZED (SELECT m${r - 1}.vec_id, LEAST(m${r - 1}.d, s.d) AS d
              FROM m${r - 1} JOIN (
                SELECT e.vec_id, SUM((e.q - ce.q)*(e.q - ce.q)) AS d
                FROM e JOIN e ce ON ce.dim = e.dim
                  AND ce.vec_id = (SELECT vec_id FROM c$r)
                GROUP BY 1) s USING (vec_id))"""
    }
    sb ++= "\n      "
    sb ++= (1 to k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS sel_round, vec_id, CAST(d AS BIGINT) AS dist2 FROM c$r")
      .mkString("\n      UNION ALL ")
    sb ++= "\n      ORDER BY sel_round"
    sb.toString
  }

  val queries: Seq[DeclaredQuery] = Seq(

    // ---- O37: Gopher repetition/quality rules -----------------------------
    // Row-local fold over the split array (zero shuffles — see
    // GopherRules scaladoc); the oracle takes the explode+window+3-agg
    // road and must land on identical integers.
    DeclaredQuery("gopher_repetition_gate",
      (s, dir) => graft.text.GopherRules
        .repetitionSignals(tbl(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_words"), col("mean_word_len_centi"),
          col("ttr_permille"), col("top_bigram_permille"),
          col("dup_trigram_permille"), col("keep"))
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM documents),
        l AS (SELECT doc_id, pos, t, LEAD(t, 1) OVER w AS t1, LEAD(t, 2) OVER w AS t2
              FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        ws AS (SELECT doc_id, COUNT(*) AS n_words,
                 CAST(SUM(len(t)) AS BIGINT) AS n_word_chars,
                 COUNT(DISTINCT t) AS ndw
               FROM l GROUP BY 1),
        bg AS (SELECT doc_id, t || ' ' || t1 AS g, COUNT(*) AS c
               FROM l WHERE t1 IS NOT NULL GROUP BY 1, 2),
        bga AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nbg,
                  CAST(MAX(c) AS BIGINT) AS topbg FROM bg GROUP BY 1),
        tg AS (SELECT doc_id, t || ' ' || t1 || ' ' || t2 AS g, COUNT(*) AS c
               FROM l WHERE t2 IS NOT NULL GROUP BY 1, 2),
        tga AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS ntg,
                  COUNT(*) AS ndtg FROM tg GROUP BY 1)
        SELECT w.doc_id, w.n_words,
          (100 * n_word_chars) // n_words AS mean_word_len_centi,
          (1000 * ndw) // n_words AS ttr_permille,
          (1000 * topbg) // nbg AS top_bigram_permille,
          (1000 * (ntg - ndtg)) // ntg AS dup_trigram_permille,
          (w.n_words BETWEEN 20 AND 100000)
            AND ((100 * n_word_chars) // n_words BETWEEN 200 AND 1200)
            AND ((1000 * ndw) // n_words >= 200)
            AND ((1000 * topbg) // nbg <= 180)
            AND ((1000 * (ntg - ndtg)) // ntg <= 600) AS keep
        FROM ws w JOIN bga USING (doc_id) JOIN tga USING (doc_id)
        ORDER BY w.doc_id""")),

    // ---- O38: eval-benchmark n-gram decontamination -----------------------
    // Eval set = doc_id % 10 = 7 (a deterministic stand-in benchmark);
    // a training doc is contaminated when ≥20% of its distinct 8-grams
    // appear anywhere in the eval set. The report frame LANDS once per
    // session (shared with decontamination_verdict — the O185 composition
    // pattern), so this query's former 6-scan final plan reads one compact
    // landed stage.
    DeclaredQuery("decontaminate_ngram_overlap",
      (s, dir) => ngramReport(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM documents),
        g0 AS (SELECT doc_id, t, $dkLeads
               FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        g AS (SELECT DISTINCT doc_id, substring(md5($dkGram), 1, 16) AS fp
              FROM g0 WHERE t${dk - 1} IS NOT NULL),
        ev AS (SELECT DISTINCT fp FROM g WHERE doc_id % 10 = 7),
        tr AS (SELECT doc_id, fp FROM g WHERE doc_id % 10 <> 7),
        pd AS (SELECT tr.doc_id, COUNT(*) AS n_grams,
                 CAST(SUM(CASE WHEN ev.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
               FROM tr LEFT JOIN ev ON tr.fp = ev.fp GROUP BY 1)
        SELECT d.doc_id,
          COALESCE(pd.n_grams, 0) AS n_grams,
          COALESCE(pd.n_hit, 0) AS n_hit,
          CASE WHEN COALESCE(pd.n_grams, 0) = 0 THEN CAST(0 AS BIGINT)
               ELSE (1000 * pd.n_hit) // pd.n_grams END AS contam_permille,
          CASE WHEN COALESCE(pd.n_grams, 0) = 0 THEN CAST(0 AS BIGINT)
               ELSE (1000 * pd.n_hit) // pd.n_grams END >= 200 AS contaminated
        FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        WHERE d.doc_id % 10 <> 7
        ORDER BY d.doc_id""")),

    // ---- O195: combined contamination verdict -------------------------------
    // The suite's two decontamination readings fused into the decision a
    // release actually makes: a train doc is flagged iff EITHER the n-gram
    // arm (the landed O38 report, doc_id %10 = 7 benchmark) or the
    // embedding arm (max cosine vs the SAME benchmark's vectors — eval
    // broadcast, one keyed agg, landed) fires — plus the disagreement
    // split, because "what embeddings see that n-grams miss" is the reason
    // to run both. Two threshold rows exercise different cuts: 900‰ is the
    // standard cliff (honestly null on this fixture — the O189 discipline),
    // 450‰ the sensitivity read where the arms genuinely disagree (fixture:
    // 6 n-gram-only, 3 embedding-only, 0 both). Pure composition of two
    // landed stages + answer-sized fusion (the O185 pattern); threshold
    // compare is the single shared IEEE op (max_cos · 1000 ≥ t).
    DeclaredQuery("decontamination_verdict",
      (s, dir) => {
        val ng = ngramReport(s, dir)
          .select(col("doc_id"), col("contaminated").as("ng_flag"))
        val emb = tbl(s, dir, "embeddings")
        val evalV = emb.filter(col("vec_id") % 10 === 7)
          .select(col("embedding").cast("array<double>").as("qv"))
        val mx = graft.relational.Stages.materialize(
          emb.filter(col("vec_id") % 10 =!= 7)
            .select(col("vec_id").as("doc_id"),
              col("embedding").cast("array<double>").as("v"))
            .crossJoin(broadcast(evalV))
            .withColumn("cos",
              graft.vector.VectorFunctions.cosine(col("v"), col("qv")))
            .groupBy(col("doc_id")).agg(max(col("cos")).as("max_cos")),
          "decontam_embarm")
        val joined = ng.join(mx, Seq("doc_id"))
        Seq(900L, 450L).map { t =>
          joined
            .withColumn("emb_flag",
              col("max_cos") * lit(1000.0) >= lit(t.toDouble))
            .agg(count(lit(1)).as("n_docs"),
              sum(when(col("ng_flag"), 1L).otherwise(0L)).as("n_ngram_flagged"),
              sum(when(col("emb_flag"), 1L).otherwise(0L)).as("n_emb_flagged"),
              sum(when(col("ng_flag") && col("emb_flag"), 1L).otherwise(0L))
                .as("n_both"),
              sum(when(col("ng_flag") || col("emb_flag"), 1L).otherwise(0L))
                .as("n_flagged"),
              sum(when(col("emb_flag") && !col("ng_flag"), col("doc_id"))
                .otherwise(0L)).as("emb_only_checksum"))
            .select(lit(t).as("threshold_milli"), col("n_docs"),
              col("n_ngram_flagged"), col("n_emb_flagged"), col("n_both"),
              col("n_flagged"),
              (col("n_ngram_flagged") - col("n_both")).as("n_only_ngram"),
              (col("n_emb_flagged") - col("n_both")).as("n_only_emb"),
              col("emb_only_checksum"))
        }.reduce(_ unionByName _).orderBy(col("threshold_milli"))
      },
      Some(s"""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM documents),
        g0 AS (SELECT doc_id, t, $dkLeads
               FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        g AS (SELECT DISTINCT doc_id, substring(md5($dkGram), 1, 16) AS fp
              FROM g0 WHERE t${dk - 1} IS NOT NULL),
        ev AS (SELECT DISTINCT fp FROM g WHERE doc_id % 10 = 7),
        tr AS (SELECT doc_id, fp FROM g WHERE doc_id % 10 <> 7),
        pd AS (SELECT tr.doc_id, COUNT(*) AS n_grams,
                 CAST(SUM(CASE WHEN ev.fp IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hit
               FROM tr LEFT JOIN ev ON tr.fp = ev.fp GROUP BY 1),
        ng AS (SELECT d.doc_id,
                 CASE WHEN COALESCE(pd.n_grams, 0) = 0 THEN FALSE
                      ELSE (1000 * pd.n_hit) // pd.n_grams >= 200 END AS ngflag
               FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
               WHERE d.doc_id % 10 <> 7),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        qv AS (SELECT v AS q FROM e WHERE vec_id % 10 = 7),
        cv AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 7),
        mx AS (SELECT vec_id AS doc_id,
            MAX(list_reduce(list_transform(list_zip(v, q), x -> x[1] * x[2]), (a, b) -> a + b)
              / (sqrt(list_reduce(list_transform(list_zip(v, v), x -> x[1] * x[2]), (a, b) -> a + b))
               * sqrt(list_reduce(list_transform(list_zip(q, q), x -> x[1] * x[2]), (a, b) -> a + b)))) AS m
          FROM cv CROSS JOIN qv GROUP BY 1),
        j AS (SELECT ng.doc_id, ng.ngflag, mx.m FROM ng JOIN mx USING (doc_id)),
        one AS (SELECT CAST(900 AS BIGINT) AS threshold_milli,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(CASE WHEN ngflag THEN 1 ELSE 0 END) AS BIGINT) AS n_ngram_flagged,
            CAST(SUM(CASE WHEN m * 1000.0 >= 900.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_emb_flagged,
            CAST(SUM(CASE WHEN ngflag AND m * 1000.0 >= 900.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
            CAST(SUM(CASE WHEN ngflag OR m * 1000.0 >= 900.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
            CAST(SUM(CASE WHEN m * 1000.0 >= 900.0 AND NOT ngflag THEN doc_id ELSE 0 END) AS BIGINT) AS emb_only_checksum
          FROM j),
        two AS (SELECT CAST(450 AS BIGINT) AS threshold_milli,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(CASE WHEN ngflag THEN 1 ELSE 0 END) AS BIGINT) AS n_ngram_flagged,
            CAST(SUM(CASE WHEN m * 1000.0 >= 450.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_emb_flagged,
            CAST(SUM(CASE WHEN ngflag AND m * 1000.0 >= 450.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
            CAST(SUM(CASE WHEN ngflag OR m * 1000.0 >= 450.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
            CAST(SUM(CASE WHEN m * 1000.0 >= 450.0 AND NOT ngflag THEN doc_id ELSE 0 END) AS BIGINT) AS emb_only_checksum
          FROM j),
        u AS (SELECT * FROM one UNION ALL SELECT * FROM two)
        SELECT threshold_milli, n_docs, n_ngram_flagged, n_emb_flagged,
          n_both, n_flagged,
          n_ngram_flagged - n_both AS n_only_ngram,
          n_emb_flagged - n_both AS n_only_emb,
          emb_only_checksum
        FROM u ORDER BY threshold_milli""")),

    // ---- O46: Pareto-front curation filter --------------------------------
    // Documents no other document beats on BOTH length and lexical
    // diversity — the multi-criteria keep-set. Signals are the row-local
    // Gopher folds; the running max rides the two-phase prefix-max (no
    // global sort/window — see relational/Skyline).
    DeclaredQuery("pareto_front_docs",
      (s, dir) => graft.relational.Skyline.front2D(
        graft.text.GopherRules
          .repetitionSignals(tbl(s, dir, "documents"), "text")
          .select(col("doc_id"), col("n_words"), col("ttr_permille")),
        "n_words", "ttr_permille")
        .select(col("doc_id"), col("n_words"), col("ttr_permille"))
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        ws AS (SELECT doc_id, COUNT(*) AS n_words, COUNT(DISTINCT t) AS ndw
               FROM tok GROUP BY 1),
        s AS (SELECT doc_id, n_words, (1000 * ndw) // n_words AS ttr FROM ws),
        p AS (SELECT n_words, MAX(ttr) AS ymax FROM s GROUP BY 1),
        m AS (SELECT n_words, ymax,
                MAX(ymax) OVER (ORDER BY n_words DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
              FROM p)
        SELECT s.doc_id, s.n_words, s.ttr AS ttr_permille
        FROM s JOIN m USING (n_words)
        WHERE s.ttr = m.ymax AND (m.m1 IS NULL OR s.ttr > m.m1)
        ORDER BY s.doc_id""")),

    // ---- O39: k-center greedy coreset -------------------------------------
    // Exact integer distances make the greedy trajectory bit-reproducible;
    // the oracle replays all 8 rounds as chained CTEs.
    DeclaredQuery("kcenter_coreset",
      (s, dir) => graft.vector.Coreset
        .kCenterGreedy(tbl(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
        .withColumnRenamed("round", "sel_round")
        .orderBy(col("sel_round")),
      Some(coresetOracle(8))),

    // ---- classifier-evaluation view of the heuristic language ID ----------
    // Confusion matrix of actual lang vs langId prediction with per-row
    // recall in exact permille — the evaluation sibling of text_lang_id
    // (which hashes the per-doc predictions) and nb_calibration_bins
    // (which audits the NB filter). Category²-bounded output, row totals
    // broadcast.
    DeclaredQuery("langid_confusion",
      (s, dir) => {
        val pred = tbl(s, dir, "documents").select(
          col("lang"), graft.text.TextFunctions.langId(col("text")).as("pred"))
        val cells = pred.groupBy(col("lang"), col("pred"))
          .agg(count(lit(1)).as("n"))
        val totals = cells.groupBy("lang").agg(sum("n").as("__t"))
        cells.join(broadcast(totals), Seq("lang"))
          .withColumn("recall_permille", expr("(1000L * n) div __t"))
          .select(col("lang"), col("pred"), col("n"), col("recall_permille"))
          .orderBy(col("lang"), col("pred"))
      },
      Some("""WITH h AS (SELECT doc_id, lang,
          len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS s_en,
          len(list_filter(string_split(text, ' '), t -> t IN ('el', 'la', 'de', 'que', 'es'))) AS s_es,
          len(list_filter(string_split(text, ' '), t -> t IN ('le', 'la', 'de', 'et', 'est'))) AS s_fr,
          len(list_filter(string_split(text, ' '), t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS s_de,
          len(list_filter(string_split(text, ' '), t -> t IN ('的', '是', '在', '了', '和'))) AS s_zh
        FROM documents),
        p AS (SELECT lang,
          CASE WHEN greatest(s_en, s_es, s_fr, s_de, s_zh) <= 0 THEN 'und'
               WHEN s_en = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'en'
               WHEN s_es = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'es'
               WHEN s_fr = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'fr'
               WHEN s_de = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'de'
               ELSE 'zh' END AS pred
          FROM h),
        c AS (SELECT lang, pred, COUNT(*) AS n FROM p GROUP BY 1, 2),
        t AS (SELECT lang, SUM(n) AS tt FROM c GROUP BY 1)
        SELECT c.lang, c.pred, c.n,
          CAST((1000 * c.n) // t.tt AS BIGINT) AS recall_permille
        FROM c JOIN t USING (lang)
        ORDER BY c.lang, c.pred""")),

    // ---- O50: silhouette cluster-quality audit ----------------------------
    // Mean-squared-distance silhouette per point with NO pairwise join
    // (sums-of-squares identity — see ClusterQuality scaladoc); doubles
    // are single IEEE ops over exact (<2^53) integers, identically
    // parenthesized in the oracle.
    DeclaredQuery("embedding_silhouette",
      (s, dir) => graft.vector.ClusterQuality
        .silhouette(tbl(s, dir, "embeddings"), "vec_id", "embedding", "label")
        .orderBy(col("vec_id")),
      Some("""WITH e AS (
          SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT) AS qv
          FROM embeddings),
        m AS (SELECT label AS cls, dim, SUM(qv) AS s, SUM(qv*qv) AS q2,
                COUNT(*) AS n
              FROM e GROUP BY 1, 2),
        pc AS (SELECT e.vec_id, e.label, m.cls,
                 CAST(SUM(m.n * e.qv * e.qv - 2 * e.qv * m.s + m.q2) AS BIGINT) AS x,
                 MAX(m.n) AS nc
               FROM e JOIN m USING (dim) GROUP BY 1, 2, 3),
        r AS (SELECT vec_id, label, cls,
                CASE WHEN cls = label
                     THEN CASE WHEN nc > 1 THEN CAST(x AS DOUBLE) / (nc - 1) END
                     ELSE CAST(x AS DOUBLE) / nc END AS ratio
              FROM pc)
        SELECT vec_id, CAST(label AS BIGINT) AS label,
          MAX(CASE WHEN cls = label THEN ratio END) AS a_own,
          MIN(CASE WHEN cls <> label THEN ratio END) AS b_other,
          (MIN(CASE WHEN cls <> label THEN ratio END) -
           MAX(CASE WHEN cls = label THEN ratio END)) /
          GREATEST(MAX(CASE WHEN cls = label THEN ratio END),
                   MIN(CASE WHEN cls <> label THEN ratio END)) AS silhouette
        FROM r GROUP BY 1, 2
        ORDER BY vec_id""")),

    // ---- O49: exact-balance stratified k-fold -----------------------------
    // Round-robin over a deterministic md5 shuffle within each (source,
    // lang) stratum: per-(stratum, fold) counts differ by at most one —
    // the gate hashes the balance ledger itself.
    DeclaredQuery("kfold_stratified",
      (s, dir) => {
        val folded = graft.text.Sampling.stratifiedKFold(
          tbl(s, dir, "documents"), Seq("source", "lang"), col("doc_id"), k = 5)
        val counts = folded.groupBy(col("source"), col("lang"), col("fold"))
          .agg(count(lit(1)).as("n"))
        val ledger = counts.groupBy(col("source"), col("lang"))
          .agg(min(col("n")).as("__mn"), max(col("n")).as("__mx"))
        counts.join(ledger, Seq("source", "lang"))
          .select(col("source"), col("lang"), col("fold"), col("n"),
            (col("__mx") - col("__mn") <= 1).as("balanced"))
          .orderBy(col("source"), col("lang"), col("fold"))
      },
      Some("""WITH f AS (SELECT source, lang,
                 (ROW_NUMBER() OVER (PARTITION BY source, lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1) % 5 AS fold
               FROM documents),
        c AS (SELECT source, lang, CAST(fold AS BIGINT) AS fold,
                COUNT(*) AS n FROM f GROUP BY 1, 2, 3),
        l AS (SELECT source, lang, MIN(n) AS mn, MAX(n) AS mx
              FROM c GROUP BY 1, 2)
        SELECT c.source, c.lang, c.fold, c.n, l.mx - l.mn <= 1 AS balanced
        FROM c JOIN l USING (source, lang)
        ORDER BY c.source, c.lang, c.fold""")),

    // ---- O48: kNN-graph triangle census -----------------------------------
    // Local clustering structure of the k=3 cosine graph: triangles per
    // node and the clustering coefficient in exact permille. The
    // canonical-order trick (a<b<c paths, one EXISTS probe) counts each
    // triangle once; every join is degree-bounded (≤ 2k per node after
    // symmetrization) and equi-keyed — the standard distributed triangle
    // census, no enumeration of non-edges. The edge build is the IVF
    // coarse-cell path (equi-join on cell id, no full-side broadcast, no
    // O(n²) pair stage); the oracle replays the identical cells.
    DeclaredQuery("knn_triangle_count",
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        // shared landed undirected-edge stage (Dsl.knnUndirected)
        val und = knnUndirected(s, dir)
        val tri = und.as("e1")
          .join(und.as("e2"), col("e1.b") === col("e2.a"))
          .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
          .join(und.select(col("a").as("x"), col("b").as("z")),
            Seq("x", "z"), "left_semi")
        val tn = tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
          .groupBy("id").agg(count(lit(1)).as("t"))
        val deg = und.select(explode(array(col("a"), col("b"))).as("id"))
          .groupBy("id").agg(count(lit(1)).as("d"))
        emb.select(col("vec_id").as("id"))
          .join(deg, Seq("id"), "left")
          .join(tn, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("d"), lit(0L)).as("degree"),
            coalesce(col("t"), lit(0L)).as("n_triangles"),
            when(coalesce(col("d"), lit(0L)) >= 2,
              expr("(2000L * coalesce(t, 0L)) div (d * (d - 1L))"))
              .otherwise(lit(0L)).as("clustering_permille"))
          .orderBy(col("id"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        seeds AS (SELECT vec_id AS sid, v AS sv FROM e ORDER BY vec_id LIMIT (SELECT 1 << least(16, length(bin(CAST(COUNT(*) AS BIGINT) - 1)) // 2) FROM e)),
        cass AS (
          SELECT vec_id, v, sid FROM (
            SELECT e.vec_id, e.v, s.sid,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                list_reduce(list_transform(list_zip(e.v, s.sv), x -> x[1] * x[2]), (a, b) -> a + b)
                / (sqrt(list_reduce(list_transform(list_zip(e.v, e.v), x -> x[1] * x[2]), (a, b) -> a + b))
                 * sqrt(list_reduce(list_transform(list_zip(s.sv, s.sv), x -> x[1] * x[2]), (a, b) -> a + b)))
                DESC, s.sid) AS rn
            FROM e CROSS JOIN seeds s) t WHERE rn = 1),
        qass AS (
          SELECT qid, qv, sid FROM (
            SELECT e.vec_id AS qid, e.v AS qv, s.sid,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                list_reduce(list_transform(list_zip(e.v, s.sv), x -> x[1] * x[2]), (a, b) -> a + b)
                / (sqrt(list_reduce(list_transform(list_zip(e.v, e.v), x -> x[1] * x[2]), (a, b) -> a + b))
                 * sqrt(list_reduce(list_transform(list_zip(s.sv, s.sv), x -> x[1] * x[2]), (a, b) -> a + b)))
                DESC, s.sid) AS rn
            FROM e CROSS JOIN seeds s) t WHERE rn <= 4),
        scored AS MATERIALIZED (
          SELECT DISTINCT q.qid, c.vec_id AS cid,
            list_reduce(list_transform(list_zip(q.qv, c.v), x -> x[1] * x[2]), (a, b) -> a + b)
            / (sqrt(list_reduce(list_transform(list_zip(q.qv, q.qv), x -> x[1] * x[2]), (a, b) -> a + b))
             * sqrt(list_reduce(list_transform(list_zip(c.v, c.v), x -> x[1] * x[2]), (a, b) -> a + b))) AS score
          FROM qass q JOIN cass c USING (sid) WHERE c.vec_id <> q.qid),
        knn AS MATERIALIZED (SELECT qid, cid FROM (
            SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rk
            FROM scored) t WHERE rk <= 3),
        und AS MATERIALIZED (SELECT DISTINCT LEAST(qid, cid) AS a, GREATEST(qid, cid) AS b FROM knn),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM und e1 JOIN und e2 ON e2.a = e1.b
                WHERE EXISTS (SELECT 1 FROM und u WHERE u.a = e1.a AND u.b = e2.b)),
        tn AS (SELECT id, COUNT(*) AS t FROM (
                 SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
                 UNION ALL SELECT z FROM tri) GROUP BY 1),
        deg AS (SELECT id, COUNT(*) AS d FROM (
                  SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        n AS (SELECT vec_id AS id FROM e)
        SELECT n.id, COALESCE(deg.d, 0) AS degree, COALESCE(tn.t, 0) AS n_triangles,
          CASE WHEN COALESCE(deg.d, 0) >= 2
               THEN (2000 * COALESCE(tn.t, 0)) // (deg.d * (deg.d - 1))
               ELSE CAST(0 AS BIGINT) END AS clustering_permille
        FROM n LEFT JOIN deg ON deg.id = n.id LEFT JOIN tn ON tn.id = n.id
        ORDER BY n.id""")),

    // ---- O40: per-class embedding outliers --------------------------------
    // Farthest-from-centroid top-5 per label on the n²-scaled integer
    // distance; ratio_permille is the exact distance-to-class-mean ratio.
    DeclaredQuery("embedding_outliers",
      (s, dir) => graft.vector.Outliers
        .perClassOutliers(tbl(s, dir, "embeddings"),
          "vec_id", "embedding", "label", topK = 5)
        .orderBy(col("label"), desc("dist2n"), col("vec_id")),
      Some("""WITH e AS (
          SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT) AS qv
          FROM embeddings),
        s AS (SELECT label, dim, SUM(qv) AS sm, COUNT(*) AS n FROM e GROUP BY 1, 2),
        d AS (SELECT e.label, e.vec_id,
                SUM((s.n * e.qv - s.sm) * (s.n * e.qv - s.sm)) AS dist2n
              FROM e JOIN s ON s.label = e.label AND s.dim = e.dim
              GROUP BY 1, 2),
        l AS (SELECT label, SUM(dist2n) AS tot, COUNT(*) AS nl FROM d GROUP BY 1),
        r AS (SELECT d.label, d.vec_id, CAST(d.dist2n AS BIGINT) AS dist2n,
                CASE WHEN l.tot = 0 THEN CAST(0 AS BIGINT)
                     ELSE CAST((1000 * d.dist2n * l.nl) // l.tot AS BIGINT)
                END AS ratio_permille,
                ROW_NUMBER() OVER (PARTITION BY d.label
                  ORDER BY d.dist2n DESC, d.vec_id) AS rk
              FROM d JOIN l USING (label))
        SELECT CAST(label AS BIGINT) AS label, vec_id, dist2n, ratio_permille
        FROM r WHERE rk <= 5
        ORDER BY label, dist2n DESC, vec_id"""))
  )
}
