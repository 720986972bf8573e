package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct armor for the distributed prefix sum both packing and systematic
  * sampling ride on: exact agreement with the driver-computed running sum
  * under arbitrary partitioning, bucket counts, id skew, and degenerate
  * inputs — and recompute-determinism (the property `localCheckpoint` used
  * to buy by materialization, now guaranteed by plan-deterministic
  * bucketing).
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def check(rows: Seq[(Long, Long)], parts: Int, numParts: Int): Unit = {
    val df = spark.sparkContext.parallelize(rows, parts).toDF("id", "v")
    val (out, total) = PrefixSum.runningSum(df, "id", "v", "cw", numParts)
    val got = out.select("id", "cw").as[(Long, Long)].collect().toMap
    var acc = 0L
    val expected = rows.sortBy(_._1).map { case (id, v) => acc += v; id -> acc }.toMap
    assert(got === expected, s"parts=$parts numParts=$numParts")
    assert(total === rows.map(_._2).sum)
  }

  test("matches the driver-side running sum under any partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0L until 500L).toVector).map(id => id -> (rnd.nextInt(50) + 1).toLong)
    for (parts <- Seq(1, 3, 32); numParts <- Seq(1, 4, 64)) check(rows, parts, numParts)
  }

  test("skewed, sparse, and negative ids keep exact order") {
    // ids cluster at two far ends with a lone outlier — most uniform
    // buckets are empty, two are heavy; offsets must still be exact
    val rows = (Seq.tabulate(50)(i => i.toLong) ++
      Seq.tabulate(50)(i => 1000000L + i) :+ -5000L)
      .map(id => id -> (id.abs % 7 + 1))
    check(rows, 5, 16)
  }

  test("degenerate inputs: empty and single-row") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("id", "v")
    val (out0, t0) = PrefixSum.runningSum(empty, "id", "v", "cw", 8)
    assert(out0.count() === 0L && t0 === 0L)
    check(Seq(42L -> 9L), 2, 8)
  }

  test("recompute-deterministic: two actions over one frame agree") {
    val rows = (0L until 200L).map(id => id -> (id % 5 + 1))
    val df = spark.sparkContext.parallelize(rows, 6).toDF("id", "v")
    val (out, _) = PrefixSum.runningSum(df, "id", "v", "cw", 8)
    val first = out.select("id", "cw").as[(Long, Long)].collect().sorted
    val second = out.select("id", "cw").as[(Long, Long)].collect().sorted
    assert(first.sameElements(second))
  }

  test("grouped running sum matches per-group driver-side sums") {
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((0L until 300L).toVector)
      .map(id => (id, s"g${id % 3}", rnd.nextInt(20) + 1L))
    val df = spark.sparkContext.parallelize(rows, 7).toDF("id", "g", "v")
    for (numParts <- Seq(1, 4, 32)) {
      val out = PrefixSum.groupedRunningSum(df, "g", "id", "v", "cw", numParts)
      val got = out.select("id", "cw").as[(Long, Long)].collect().toMap
      val expected = rows.groupBy(_._2).values.flatMap { grp =>
        var acc = 0L
        grp.sortBy(_._1).map { case (id, _, v) => acc += v; id -> acc }
      }.toMap
      assert(got === expected, s"numParts=$numParts")
    }
  }

  test("grouped sum: one-group degenerate equals ungrouped, empty is empty") {
    val rows = (0L until 50L).map(id => (id, "only", id % 4 + 1L))
    val df = spark.sparkContext.parallelize(rows, 3).toDF("id", "g", "v")
    val grouped = PrefixSum.groupedRunningSum(df, "g", "id", "v", "cw", 8)
      .select("id", "cw").as[(Long, Long)].collect().toMap
    val (plain, _) = PrefixSum.runningSum(df, "id", "v", "cw", 8)
    assert(grouped === plain.select("id", "cw").as[(Long, Long)].collect().toMap)
    val empty = spark.emptyDataset[(Long, String, Long)].toDF("id", "g", "v")
    assert(PrefixSum.groupedRunningSum(empty, "g", "id", "v", "cw", 8).count() === 0L)
  }

  test("grouped sum joins offsets on the NATIVE group type (timestamps)") {
    // java.sql.Timestamp.toString renders '...10:00:00.0' where Spark's
    // string cast renders '...10:00:00' — the old string-keyed offset join
    // missed every group and silently zeroed offsets. Native-typed keys
    // cannot disagree with themselves.
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-02 11:30:00")
    val rows = (0L until 100L).map(id => (id, if (id % 2 == 0) ts0 else ts1, id % 5 + 1L))
    val df = spark.sparkContext.parallelize(rows, 4).toDF("id", "g", "v")
    val out = PrefixSum.groupedRunningSum(df, "g", "id", "v", "cw", 8)
    val got = out.select("id", "cw").as[(Long, Long)].collect().toMap
    val expected = rows.groupBy(_._2).values.flatMap { grp =>
      var acc = 0L
      grp.sortBy(_._1).map { case (id, _, v) => acc += v; id -> acc }
    }.toMap
    assert(got === expected)
  }

  test("grouped sum: null group is its own group, not an NPE") {
    val rows: Seq[(Long, java.lang.Long, Long)] =
      (0L until 40L).map(id => (id, if (id % 4 == 0) null
        else java.lang.Long.valueOf(id % 2), id + 1L))
    val df = spark.sparkContext.parallelize(rows, 3).toDF("id", "g", "v")
    val out = PrefixSum.groupedRunningSum(df, "g", "id", "v", "cw", 8)
    val got = out.select("id", "cw").as[(Long, Long)].collect().toMap
    val expected = rows.groupBy(_._2).values.flatMap { grp =>
      var acc = 0L
      grp.sortBy(_._1).map { case (id, _, v) => acc += v; id -> acc }
    }.toMap
    assert(got === expected)
  }

  test("grouped sum: all-null value cells contribute zero, not an NPE") {
    val rows: Seq[(Long, String, java.lang.Long)] =
      (0L until 30L).map(id => (id, s"g${id % 2}",
        if (id < 15) null else java.lang.Long.valueOf(id)))
    val df = spark.sparkContext.parallelize(rows, 2).toDF("id", "g", "v")
    // numParts=2 so the low-id cells of each group are all-null: their
    // TOTALS must fold in as 0 (the driver used to NPE at getLong), while
    // per-row cw keeps SQL sum semantics — null until the group's first
    // non-null value
    val out = PrefixSum.groupedRunningSum(df, "g", "id", "v", "cw", 2)
    val got = out.select("id", "cw").as[(Long, Option[Long])].collect().toMap
    val expected = rows.groupBy(_._2).values.flatMap { grp =>
      var acc = 0L; var seen = false
      grp.sortBy(_._1).map { case (id, _, v) =>
        if (v != null) { acc += v.longValue; seen = true }
        id -> (if (seen) Some(acc) else None) }
    }.toMap
    assert(got === expected)
  }

  test("runningSums: k columns in one model agree with k chained calls") {
    val rnd = new scala.util.Random(23)
    val rows = rnd.shuffle((0L until 400L).toVector)
      .map(id => (id, (rnd.nextInt(30) + 1).toLong, (rnd.nextInt(9)).toLong))
    val df = spark.sparkContext.parallelize(rows, 5).toDF("id", "a", "b")
    val (fused, totals) = PrefixSum.runningSums(
      df, "id", Seq("a" -> "ca", "b" -> "cb"), 16)
    val got = fused.select("id", "ca", "cb")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    var (aa, ab) = (0L, 0L)
    val expected = rows.sortBy(_._1).map { case (id, a, b) =>
      aa += a; ab += b; id -> (aa, ab)
    }.toMap
    assert(got === expected)
    assert(totals === Seq(rows.map(_._2).sum, rows.map(_._3).sum))
    // exactly ONE WindowExec carries both running sums (CollapseWindow):
    // a second window would serialize a second per-bucket sort pass
    val nWindows = fused.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Window"))
    assert(nWindows === 1, "both prefix sums must share one WindowExec")
  }

  test("runningSums: empty input types every output column") {
    val empty = spark.emptyDataset[(Long, Long, Long)].toDF("id", "a", "b")
    val (out, totals) = PrefixSum.runningSums(
      empty, "id", Seq("a" -> "ca", "b" -> "cb"), 8)
    assert(out.count() === 0L && totals === Seq(0L, 0L))
    assert(out.schema("ca").dataType.typeName === "long")
    assert(out.schema("cb").dataType.typeName === "long")
  }

  test("runningSums: duplicate value or out columns are refused") {
    val df = Seq((1L, 2L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.runningSums(df, "id", Seq("v" -> "c1", "v" -> "c2"), 8)
    }
    intercept[IllegalArgumentException] {
      PrefixSum.runningSums(df, "id", Seq.empty, 8)
    }
  }

  test("runningSums: '__b'-named inputs are refused, not silently shadowed") {
    // withColumn("__b", bucket) would REPLACE an input column of that name
    // before it is summed — the same silent-shadowing class the out-column
    // guard catches, on the input side (r14 advice)
    val df = Seq((1L, 2L)).toDF("__b", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.runningSums(df, "id2", Seq("__b" -> "c1"), 8)
    }
    intercept[IllegalArgumentException] {
      PrefixSum.runningSums(df.withColumnRenamed("__b", "id"),
        "__b", Seq("v" -> "c1"), 8)
    }
  }

  test("non-numeric ids fail loudly instead of returning all-zero sums") {
    // ANSI mode already throws on a malformed string cast; the engine's own
    // guard covers the silent case — ids that CAST to null (all-null ids)
    val allNull: Seq[(java.lang.Long, Long)] =
      Seq((null, 1L), (null, 2L))
    val df = spark.sparkContext.parallelize(allNull, 1).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.runningSum(df, "id", "v", "cw", 8)
    }
    assert(e.getMessage.contains("cast to null"))
    val e2 = intercept[IllegalArgumentException] {
      PrefixSum.groupedRunningSum(df.withColumn("g", lit("x")), "g", "id", "v", "cw", 8)
    }
    assert(e2.getMessage.contains("cast to null"))
    // malformed string ids are loud too (ANSI cast error, not zeros)
    val strDf = Seq(("a", 1L), ("b", 2L)).toDF("id", "v")
    intercept[Exception] { PrefixSum.runningSum(strDf, "id", "v", "cw", 8) }
  }
}
