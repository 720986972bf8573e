package graft.relational

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout operators: space-filling-curve keys for multi-dimensional
  * clustering.
  *
  * Sorting (or range-partitioning) a table by a Z-order key interleaving two
  * filter dimensions makes file-level min/max ranges tight in BOTH
  * dimensions at once, so scans filtering on either column prune files —
  * the mechanism behind Delta/Iceberg Z-ordering, available here as a plain
  * deterministic column expression (codegen'd bit ops, no UDF), usable with
  * `repartitionByRange(zValue).sortWithinPartitions(zValue)` before a
  * parquet write.
  */
object Layout {

  /** Morton (Z-order) key: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Inputs must be non-negative and fit in `bits` bits (bucket or
    * scale first); the result fits 2·bits bits.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "2*bits must stay in long range")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
