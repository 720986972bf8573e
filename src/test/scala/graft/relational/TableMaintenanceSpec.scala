package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: latest version wins, deletes drop, inserts land, keep cols survive") {
    val base = Seq(
      (1L, "a", 10.0, "keep1"),
      (2L, "b", 20.0, "keep2"),
      (3L, "c", 30.0, "keep3")
    ).toDF("k", "status", "price", "note")
    val changes = Seq(
      (1L, "U", 1L, "x", 11.0),   // superseded by v2
      (1L, "U", 2L, "y", 12.0),   // winner for key 1
      (2L, "D", 1L, "-", 0.0),    // delete key 2
      (9L, "U", 1L, "n", 99.0),   // insert key 9
      (8L, "D", 1L, "-", 0.0)     // delete of absent key: no-op
    ).toDF("k", "op", "version", "status", "price")

    val out = TableMaintenance.upsert(base, changes, "k", "version", "op",
      Seq("status", "price")).orderBy("k")
    val rows = out.select("k", "status", "price", "note").as[(Long, String, Double, String)].collect()
    assert(rows === Seq(
      (1L, "y", 12.0, "keep1"),   // update: payload from v2, keep col from base
      (3L, "c", 30.0, "keep3"),   // untouched
      (9L, "n", 99.0, null)       // insert: no base keep col
    ))
  }

  test("upsert matches a sequential CDC fold on random logs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      baseKeys <- Gen.someOf(1L to 12L)
      nCh <- Gen.chooseNum(0, 25)
      chs <- Gen.listOfN(nCh, for {
        k <- Gen.chooseNum(1L, 15L)
        op <- Gen.oneOf("U", "D")
        s <- Gen.oneOf("p", "q", "r")
      } yield (k, op, s))
    } yield (baseKeys.toSeq, chs)
    val cases = (1 to 6).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(5150L + i)))
    cases.foreach { case (baseKeys, chs0) =>
      // unique versions per key so latest-wins is unambiguous
      val chs = chs0.zipWithIndex.map { case ((k, op, s), i) =>
        (k, op, i.toLong, s)
      }
      val base = baseKeys.map(k => (k, s"b$k")).toDF("k", "status")
      val changes =
        if (chs.isEmpty) Seq.empty[(Long, String, Long, String)].toDF("k", "op", "version", "status")
        else chs.toDF("k", "op", "version", "status")
      val got = TableMaintenance.upsert(base, changes, "k", "version", "op",
        Seq("status")).select("k", "status")
        .as[(Long, String)].collect().toMap

      val latest = chs.groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
      val expect = (baseKeys.map(k => k -> s"b$k").toMap ++
        latest.collect { case (k, (_, "U", _, s)) => k -> s })
        .filterNot { case (k, _) => latest.get(k).exists(_._2 == "D") }
      assert(got === expect, s"base=$baseKeys chs=$chs")
    }
  }

  test("scd2: chains per key, exactly one current row, eff_to = next eff_from") {
    val states = Seq(
      (1L, 100L, "new"), (1L, 200L, "paid"), (1L, 300L, "shipped"),
      (2L, 150L, "new")
    ).toDF("k", "t", "st")
    val hist = TableMaintenance.scd2(states, "k", "t", "st")
      .orderBy("k", "t").collect()

    val k1 = hist.filter(_.getLong(0) == 1L)
    assert(k1.map(r => (r.getLong(1), Option(r.get(3)), r.getLong(4))).toSeq ===
      Seq((100L, Some(200L), 0L), (200L, Some(300L), 0L), (300L, None, 1L)))
    // exactly one current row per key
    val currents = hist.groupBy(_.getLong(0)).map { case (_, rs) =>
      rs.count(_.getLong(4) == 1L)
    }
    assert(currents.forall(_ == 1))
  }

  test("compaction: every file binned, bins non-decreasing, bounded by target + max file") {
    val target = 100L
    val files = Seq(
      ("s1", 0L, 40L), ("s1", 1L, 40L), ("s1", 2L, 40L), ("s1", 3L, 150L),
      ("s1", 4L, 10L), ("s2", 0L, 10L), ("s2", 1L, 10L)
    ).toDF("grp", "fid", "bytes")
    val out = TableMaintenance.compactionBins(files, "grp", "fid", "bytes", target)
      .orderBy("grp", "fid")
      .select("grp", "fid", "bytes", "bin")
      .as[(String, Long, Long, Long)].collect()

    assert(out.length == 7)                       // every file assigned
    // first file of each group is bin 0; bins never decrease in file order
    for (g <- Seq("s1", "s2")) {
      val bins = out.filter(_._1 == g).sortBy(_._2).map(_._4)
      assert(bins.head == 0L)
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    }
    // bin byte totals are < target + the largest file assigned to the bin
    val byBin = out.groupBy(r => (r._1, r._4)).map { case (_, rs) =>
      (rs.map(_._3).sum, rs.map(_._3).max)
    }
    assert(byBin.forall { case (tot, mx) => tot < target + mx })
    // the oversized 150-byte file occupies its own division range
    assert(out.filter(r => r._1 == "s1" && r._2 == 3L).head._4 == 1L)
  }

  test("snapshotDiff: all four verdicts, null-safe column compares, per-col flags") {
    val base: Seq[(Long, java.lang.Long, String)] = Seq(
      (1L, java.lang.Long.valueOf(10L), "a"),  // unchanged
      (2L, java.lang.Long.valueOf(20L), "b"),  // price changes
      (3L, null, "c"),                         // null -> value = changed
      (4L, java.lang.Long.valueOf(40L), "d"),  // removed
      (5L, null, "e"))                         // null == null = unchanged
    val next: Seq[(Long, java.lang.Long, String)] = Seq(
      (1L, java.lang.Long.valueOf(10L), "a"),
      (2L, java.lang.Long.valueOf(21L), "b"),
      (3L, java.lang.Long.valueOf(30L), "c"),
      (5L, null, "e"),
      (6L, java.lang.Long.valueOf(60L), "f"))  // added
    val out = TableMaintenance.snapshotDiff(
      base.toDF("k", "price", "status"),
      next.toDF("k", "price", "status"),
      "k", Seq("price", "status"))
      .select("k", "change", "chg_price", "chg_status")
      .as[(Long, String, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(out(1L)._2 === "unchanged" && out(1L)._3 === 0L)
    assert(out(2L)._2 === "changed" && out(2L)._3 === 1L && out(2L)._4 === 0L)
    assert(out(3L)._2 === "changed" && out(3L)._3 === 1L,
      "null -> value must count as a change (null-safe compare)")
    assert(out(4L)._2 === "removed" && out(4L)._3 === 0L)
    assert(out(5L)._2 === "unchanged", "null == null is not a change")
    assert(out(6L)._2 === "added" && out(6L)._3 === 0L)
    assert(out.size === 6)
  }
}
