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
    // redundant dims = off-diagonal mass). Upper-triangle partial products
    // form ROW-LOCALLY (nested HOF — no join, no posexplode self-join);
    // the single shuffle carries ≤ d²/2 partials per partition whatever the
    // row count — the shape that survives 100 TB. Quantized-exact
    // (floor(x·10⁴) longs, DECIMAL(38,0) sums) so every cell hash-matches.
    DeclaredQuery("embedding_gram_matrix",
      (s, dir) => graft.vector.Gram
        .upperTriangle(tbl(s, dir, "embeddings"), "embedding")
        .orderBy(col("dim_i"), col("dim_j")),
      Some("""WITH e AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * 10000) AS BIGINT)) AS q FROM embeddings),
        pos AS (SELECT unnest(range(1, 65)) AS i),
        p AS (SELECT a.i AS i, b.i AS j, CAST(q[a.i] AS HUGEINT) * q[b.i] AS prod
              FROM e CROSS JOIN pos a CROSS JOIN pos b WHERE a.i <= b.i)
        SELECT CAST(i - 1 AS BIGINT) AS dim_i, CAST(j - 1 AS BIGINT) AS dim_j,
          COUNT(*) AS n, CAST(CAST(SUM(prod) AS HUGEINT) AS VARCHAR) AS gram
        FROM p GROUP BY 1, 2 ORDER BY 1, 2""")),

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
        ORDER BY lift_permille DESC, c_xy DESC, x, y LIMIT 20"""))
  )
}
