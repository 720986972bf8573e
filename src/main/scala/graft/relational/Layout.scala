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

  /** Default interleave width: the maximum. Widening is VALUE-PRESERVING
    * for in-range inputs (zero high bits contribute zero to the key), so
    * there is no reason to size this to a fixture: the r14 sf1.0 stress
    * replay found the old fixture-sized 11 refusing on 10× ids (user_id
    * 14999 > 2^11) — right to refuse rather than alias, wrong to be sized
    * so a mere 10× outgrew it. At 31 the key fills 62 bits and only ids
    * beyond 2^31 refuse (bucket or scale those first).
    */
  val ZBits = 31

  /** Morton (Z-order) key: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Inputs must be non-negative and fit in `bits` bits (bucket or
    * scale first); the result fits 2·bits bits.
    *
    * Out-of-range or negative inputs raise at runtime rather than silently
    * aliasing onto in-range z values — silent truncation would degrade the
    * clustering (distant keys interleaved together) with no visible error.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "2*bits must stay in long range")
    def checked(c: Column, name: String): Column = {
      // negatives have the sign bit set, so the same mask catches them
      val highMask = ~((1L << bits) - 1)
      val v = c.cast("long")
      when(v.bitwiseAND(lit(highMask)) =!= 0L,
        raise_error(concat(
          lit(s"zValue: $name does not fit in $bits bits (non-negative): "),
          v.cast("string"))))
        .otherwise(v)
    }
    val (av, bv) = (checked(a, "a"), checked(b, "b"))
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(av, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(bv, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
