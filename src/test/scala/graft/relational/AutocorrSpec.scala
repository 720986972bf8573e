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
}
