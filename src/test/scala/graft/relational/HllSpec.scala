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
}
