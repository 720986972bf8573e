package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PairedSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: Seq[(Long, Int, Boolean)]) =
    // (user, period 1|2, converting row?)
    rows.map { case (u, p, c) =>
      (u, if (p == 1) "2024-01-10" else "2024-01-20",
        if (c) "purchase" else "view")
    }.toDF("user_id", "d", "event_type")
      .withColumn("ts", to_timestamp(col("d")))

  private def run(df: org.apache.spark.sql.DataFrame) =
    Paired.mcnemarFlip(df, "user_id",
      to_date(col("ts")) <= lit("2024-01-15").cast("date"),
      to_date(col("ts")) > lit("2024-01-15").cast("date"),
      col("event_type") === "purchase")

  test("2x2 cells count correctly and concordant users carry no evidence") {
    // u1 both, u2 neither, u3 1->0, u4 0->1, u5 0->1:
    // b=1, c=2 -> chi2 = 1e6*1/3 = 333333, quiet
    val df = log(Seq(
      (1L, 1, true), (1L, 2, true),
      (2L, 1, false), (2L, 2, false),
      (3L, 1, true), (3L, 2, false),
      (4L, 1, false), (4L, 2, true),
      (5L, 1, false), (5L, 2, true)))
    val out = run(df)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(out === ((5L, 1L, 1L, 1L, 2L, 333333L, false)))
  }

  test("a one-directional flip wave fires the flag") {
    // 12 users all flip 0->1, one flips back: b=1, c=12 ->
    // chi2 = 1e6*121/13 = 9307692 > 3841459
    val wave = (1L to 12L).flatMap(u => Seq((u, 1, false), (u, 2, true))) ++
      Seq((13L, 1, true), (13L, 2, false))
    val out = run(log(wave))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(out._6 === 9307692L && out._7)
  }

  test("DECIMAL carry is exact past the long-wrap point (|b-c| = 3.1e6)") {
    // 3,100,001 users each flipping 0->1 in period 2 only: plain long
    // arithmetic wrapped at |b-c| ~ 3.03e6 (1e6*d^2 > 2^63); the
    // DECIMAL(38,0) carry keeps chi2_micro = 1e6*d^2/d = 1e6*d exact
    val d = 3100001L
    val df = spark.range(d)
      .select(col("id").as("user_id"),
        to_timestamp(lit("2024-01-20")).as("ts"),
        lit("purchase").as("event_type"))
    val out = run(df).select("chi2_micro", "flip_flag")
      .as[(Long, Boolean)].collect().head
    assert(out === ((1000000L * d, true)))
  }

  test("zero discordance refuses loudly — nothing to test") {
    val df = log(Seq((1L, 1, true), (1L, 2, true),
      (2L, 1, false), (2L, 2, false)))
    val e = intercept[Exception] { run(df).collect() }
    assert(e.getMessage.contains("discordant") ||
      Option(e.getCause).exists(_.getMessage.contains("discordant")))
  }
}
