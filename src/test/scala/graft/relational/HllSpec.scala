package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def refAudit(ids: Seq[Long]): (Long, Long, Long) = {
    // independent reference: same 60-bit md5 slice, registers and dyadic
    // harmonic sum recomputed in plain Scala BigInt
    val hashes = ids.map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      // SQL substring(md5, 1, 15) is 1-indexed: the FIRST 15 hex chars
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val regs = hashes.groupBy(_ >>> 54).map { case (r, hs) =>
      r -> hs.map { h =>
        val w = h & ((1L << 54) - 1)
        if (w == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      }.max
    }
    val s = regs.values.map(m => BigInt(1) << (55 - m)).sum +
      BigInt(64 - regs.size) * (BigInt(1) << 55)
    val est = (BigInt(709) * 4096 * (BigInt(1) << 55)) / (1000 * s)
    (hashes.distinct.size.toLong, 64L - regs.size, est.toLong)
  }

  test("distinctAudit matches the independent reference on random ids") {
    val ids = (1L to 300L).map(i => (i * 2654435761L) % 1000003L)
    val df = ids.map(("g", _)).toDF("grp", "id")
    val got = Hll.distinctAudit(df, "grp", "id")
      .as[(String, Long, Long, Long, Boolean, Long)].collect().toSeq
    val (exact, empty, est) = refAudit(ids)
    assert(got === Seq(("g", exact, empty, est, false,
      1000L * (est - exact) / exact)))
  }

  test("duplicates never move a register: sketch of ids == ids ++ ids") {
    val ids = (1L to 50L).toSeq
    val once = Hll.distinctAudit(ids.map(("g", _)).toDF("grp", "id"),
      "grp", "id").collect().toSeq
    val twice = Hll.distinctAudit((ids ++ ids).map(("g", _)).toDF("grp", "id"),
      "grp", "id").collect().toSeq
    assert(once === twice)
  }

  test("small-range flag raises on tiny groups instead of hiding the bias") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("grp", "id")
    val row = Hll.distinctAudit(df, "grp", "id")
      .as[(String, Long, Long, Long, Boolean, Long)].collect().head
    assert(row._3 > 0L)   // 61 of 64 registers empty
    assert(row._5)        // small_range flagged
  }

  test("linear-counting table is frozen m*ln(m/V) and the correction applies only on small_range") {
    // the table is literals by construction; spot-check anchor values
    val lut = Hll.linearCountingTable.toMap
    assert(lut(64L) === 0L)
    assert(lut(32L) === Math.round(64 * StrictMath.log(2.0)))  // 44
    assert(lut(1L) === Math.round(64 * StrictMath.log(64.0))) // 266
    assert(Hll.linearCountingTable.size === 64)
    // small group: corrected estimate comes from the LUT at V
    val small = Hll.withLinearCounting(Hll.distinctAudit(
      Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("grp", "id"), "grp", "id"))
      .select("empty_registers", "hll_estimate", "corrected_estimate")
      .as[(Long, Long, Long)].collect().head
    assert(small._3 === lut(small._1))
    // large group (~3000 distinct): small_range false, estimate untouched
    val ids = (1L to 3000L).map(i => (i * 2654435761L) % 1000003L)
    val big = Hll.withLinearCounting(Hll.distinctAudit(
      ids.map(("g", _)).toDF("grp", "id"), "grp", "id"))
      .select("small_range", "hll_estimate", "corrected_estimate")
      .as[(Boolean, Long, Long)].collect().head
    assert(!big._1 && big._2 === big._3)
  }
}
