package graft

/** No declared query may leave cache entries behind after it executes.
  *
  * Operator-internal `.cache()` calls in lazy-returning operators have no
  * unpersist point, so a long-lived session running many pipelines
  * accumulates corpus-sized entries (and MEMORY_AND_DISK blocks spilled to
  * disk are never reclaimed by memory-LRU eviction). The operators now share
  * work via ReuseExchange / recompute instead; iterative algorithms that DO
  * materialize internally (connected components) must unpersist what they
  * pin. This spec locks that in for the cache-heaviest query families.
  */
class CacheHygieneSpec extends SparkSpec {

  test("declared queries leave the CacheManager empty after execution") {
    spark.catalog.clearCache()
    Seq("line_dedup_stats", "sparse_cosine_pairs", "semdedup_keep",
      "minhash_portable_pairs", "minhash_fastpath_containment",
      "dedup_components", "dedup_canonical_docs", "curation_pipeline_e2e")
      .foreach { q =>
        SparkEntry.queries(q)(spark, sf0001).collect()
        assert(spark.sharedState.cacheManager.isEmpty,
          s"$q left cached plans registered in the CacheManager")
      }
  }
}
