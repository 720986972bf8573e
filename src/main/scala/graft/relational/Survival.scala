package graft.relational

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kaplan–Meier product-limit survival (Kaplan & Meier 1958, JASA) over
  * entity lifetimes — the retention curve that handles censoring honestly:
  * an entity whose last activity sits within `horizonDays` of the
  * dataset's end hasn't churned, it's just still alive (right-censored),
  * and it leaves the risk set without counting as a death.
  *
  *     S(t) = Π_{dᵢ ≤ t} (nᵢ − deathsᵢ) / nᵢ
  *
  * Exactness: survival is carried in permille with the truncating integer
  * recurrence s ← (s·(nᵢ−deathsᵢ)) div nᵢ applied in day order — a product
  * of rationals has no closed integer form, so BOTH engines replay the
  * same recurrence (the oracle as a RECURSIVE CTE over the day-ordered
  * risk table); order is pinned by the day index, so the fold is
  * deterministic.
  *
  * Scale: everything until the day table is keyed Spark aggregation
  * (per-entity min/max, then a day-grained rollup). The day table is
  * LIFESPAN-sized — bounded by the calendar, not the data — and is the
  * bounded-model-collect class: `limit(cap+1)` + loud require before the
  * driver fold (the probeDictionary pattern; a million-day table means the
  * caller's day grain is wrong, not that the driver should OOM).
  */
object Survival {

  private val outSchema = StructType(Seq(
    StructField("day", LongType, nullable = false),
    StructField("at_risk", LongType, nullable = false),
    StructField("deaths", LongType, nullable = false),
    StructField("survival_permille", LongType, nullable = false)))

  /** One row per death day: (day, at_risk, deaths, survival_permille),
    * day = whole days from the entity's first to last `tsCol`, censored
    * when the last activity is within `horizonDays` of max(tsCol).
    */
  def retention(spark: SparkSession, df: DataFrame, idCol: String,
                tsCol: String, horizonDays: Int = 90,
                maxDays: Int = 4096): DataFrame = {
    val per = df.groupBy(col(idCol))
      .agg(min(col(tsCol)).as("__a"), max(col(tsCol)).as("__b"))
    val mx = per.agg(max(col("__b")).as("__m"))
    val life = per.join(broadcast(mx))
      .select(
        datediff(to_date(col("__b")), to_date(col("__a"))).cast("long")
          .as("__d"),
        when(col("__b") > col("__m") - expr(s"INTERVAL $horizonDays DAYS"),
          0L).otherwise(1L).as("__death"))
    val days = life.groupBy(col("__d"))
      .agg(sum(col("__death")).as("__deaths"), count(lit(1)).as("__ended"))
      .orderBy(col("__d"))

    // Bounded-model collect: lifespan-sized by contract, loudly capped.
    val rows = days.limit(maxDays + 1).collect()
    require(rows.length <= maxDays,
      s"day table exceeds $maxDays rows — lifetimes span more days than " +
        "the cap; coarsen the grain or raise maxDays deliberately")

    val total = rows.map(_.getLong(2)).sum
    var atRisk = total
    var s = 1000L
    val out = Vector.newBuilder[Row]
    rows.foreach { r =>
      val (day, deaths, ended) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (deaths > 0) {
        s = s * (atRisk - deaths) / atRisk
        out += Row(day, atRisk, deaths, s)
      }
      atRisk -= ended
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.result(), 1), outSchema)
  }
}
