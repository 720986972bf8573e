package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AutocorrSpec extends SparkSpec {
  import spark.implicits._

  private def eventsFor(counts: Seq[(Int, Int)]) =
    // (dayOfMonth, n) → n rows at noon on 2024-01-<day>
    counts.flatMap { case (d, n) => Seq.fill(n)(f"2024-01-$d%02d 12:00:00") }
      .toDF("tss").withColumn("ts", to_timestamp(col("tss")))

  test("perfect alternation: lag-1 rho is −1, lag-2 rho is +1") {
    val df = eventsFor((1 to 10).map(d => (d, if (d % 2 == 1) 5 else 15)))
    val out = Autocorr.dailyAcf(df, "ts", maxLag = 2)
      .select("lag", "n_pairs", "acf")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(out.map(r => (r._1, r._2)) === Seq((1L, 9L), (2L, 8L)))
    assert(math.abs(out(0)._3.get + 1.0) < 1e-12)
    assert(math.abs(out(1)._3.get - 1.0) < 1e-12)
  }

  test("a constant series has zero variance at every lag: acf is NULL") {
    val df = eventsFor((1 to 5).map(d => (d, 3)))
    val out = Autocorr.dailyAcf(df, "ts", maxLag = 3)
      .select("acf").as[Option[Double]].collect().toSeq
    assert(out === Seq(None, None, None))
  }

  test("gap days pair only where both endpoints exist") {
    // days 1,2,4: lag 1 pairs (1,2) only; lag 2 pairs (2,4); lag 3 (1,4)
    val df = eventsFor(Seq((1, 2), (2, 4), (4, 8)))
    val out = Autocorr.dailyAcf(df, "ts", maxLag = 3)
      .select("lag", "n_pairs").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("misuse fails loudly: non-timestamp column, bad maxLag") {
    val df = eventsFor(Seq((1, 1))).withColumn("sec", lit(5L))
    intercept[IllegalArgumentException](Autocorr.dailyAcf(df, "sec"))
    intercept[IllegalArgumentException](Autocorr.dailyAcf(df, "ts", maxLag = 0))
  }

  private def typedEventsFor(counts: Seq[(String, Int, Int)]) =
    counts.flatMap { case (t, d, n) =>
      Seq.fill(n)((t, f"2024-01-$d%02d 12:00:00"))
    }.toDF("t", "tss").withColumn("ts", to_timestamp(col("tss")))

  test("xcf: a series shifted one day forward peaks at lag +1") {
    // b on day d+1 copies a on day d → ρ = +1 at lag 1, −1 at lag 0
    val a = (1 to 10).map(d => ("a", d, if (d % 2 == 1) 5 else 15))
    val b = (1 to 10).map(d => ("b", d + 1, if (d % 2 == 1) 5 else 15))
    val out = Autocorr.dailyXcf(typedEventsFor(a ++ b), "ts", "t", "a", "b",
      maxLag = 1).select("lag", "xcf")
      .as[(Long, Option[Double])].collect().toMap
    assert(math.abs(out(1L).get - 1.0) < 1e-12)
    // the unshifted alignment is nowhere near (edge zeros break ±1)
    assert(out(0L).get < 0.5)
  }

  test("xcf misuse fails loudly: identical types") {
    val df = typedEventsFor(Seq(("a", 1, 1)))
    intercept[IllegalArgumentException](
      Autocorr.dailyXcf(df, "ts", "t", "a", "a"))
  }
}
