package graft.queries

/** All declared engine queries — the coverage inventory the driver verifies
  * (oracle hash-match at sf0.01) and benches (sf0.1). SURVEY.md §2 rows map
  * here; each oracle-less entry has ScalaTest property coverage instead.
  */
object Registry {
  val all: Seq[DeclaredQuery] =
    RelationalQueries.queries ++ ExtendedQueries.queries ++ ScalarQueries.queries ++
      EventQueries.queries ++ PipelineQueries.queries ++ CurationQueries.queries ++
      MaintenanceQueries.queries ++ TokenizerQueries.queries ++ QualityQueries.queries ++
      CorpusQueries.queries ++ AnalyticsQueries.queries ++ ProfilingQueries.queries ++
      AuditQueries.queries

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
