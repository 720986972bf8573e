package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the close gate's scan counter — the parser that turns
  * a final plan string into per-base-table scan counts. The gate refuses
  * plans above PlanAudit.scanBounds, so the parser itself needs pinning:
  * a regression here silently disables the double-scan refusal.
  */
class PlanAuditScanSpec extends AnyFunSuite {

  test("counts scans per base table from Location entries") {
    val plan =
      """*(1) Project [l_orderkey#0L]
        |+- FileScan parquet [l_orderkey#0L] Batched: true, Location: InMemoryFileIndex(1 paths)[file:/root/testdata/sf0.01/lineitem.parquet], PushedFilters: []
        |+- FileScan parquet [o_orderkey#9L] Batched: true, Location: InMemoryFileIndex(1 paths)[file:/root/testdata/sf0.01/orders.parquet], PushedFilters: []
        |+- FileScan parquet [l_partkey#1L] Batched: true, Location: InMemoryFileIndex(1 paths)[file:/root/testdata/sf0.01/lineitem.parquet], PushedFilters: []
        |""".stripMargin
    assert(PlanAudit.tableScans(plan) ===
      Map("lineitem" -> 2, "orders" -> 1))
  }

  test("landed-stage re-reads are excluded; multi-path indexes count once") {
    val plan =
      """+- FileScan parquet Location: InMemoryFileIndex(1 paths)[file:/tmp/graft_stage_nb_scores123456/data.parquet]
        |+- FileScan parquet Location: InMemoryFileIndex(2 paths)[file:/root/testdata/sf0.01/events.parquet, file:/root/testdata/sf0.01b/events.parquet]
        |""".stripMargin
    assert(PlanAudit.tableScans(plan) === Map("events" -> 1))
  }

  test("declared bounds: default is 2, exceptions resolve by name") {
    assert(PlanAudit.scanBound("some_new_query") === PlanAudit.defaultScanBound)
    assert(PlanAudit.scanBound("funnel_view_click_purchase") === 5)
    assert(PlanAudit.scanBounds.values.forall(_ > PlanAudit.defaultScanBound),
      "an exception at or below the default is dead weight")
    assert(PlanAudit.auxScanBound("some_new_query") === PlanAudit.defaultScanBound)
    assert(PlanAudit.auxScanBounds.values.forall(_ > PlanAudit.defaultScanBound),
      "an aux exception at or below the default is dead weight")
  }

  test("stream bounds: default 2, declared exceptions above it") {
    assert(PlanAudit.streamScanBound("stream_whatever") ===
      PlanAudit.defaultScanBound)
    assert(PlanAudit.streamScanBounds.values.forall(_ > PlanAudit.defaultScanBound),
      "a stream exception at or below the default is dead weight")
  }

  test("locationMismatch flags truncated or format-drifted Location entries") {
    val good =
      """+- FileScan parquet Location: InMemoryFileIndex(1 paths)[file:/root/testdata/sf0.01/lineitem.parquet]
        |""".stripMargin
    assert(PlanAudit.locationMismatch(good) === 0)
    // the default spark.sql.maxMetadataStringLength=100 truncation shape:
    // the bracketed path list is cut and "..." appended — no closing ']'
    val truncated =
      """+- FileScan parquet Location: InMemoryFileIndex(1 paths)[file:/root/testdata/some/very/long/path/that/got/cut...
        |+- FileScan parquet Location: InMemoryFileIndex(1 paths)[file:/root/testdata/sf0.01/orders.parquet]
        |""".stripMargin
    assert(PlanAudit.locationMismatch(truncated) === 1)
  }
}
