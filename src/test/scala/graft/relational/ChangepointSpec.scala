package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def eventsFor(counts: Seq[(String, Int, Int)]) =
    // (key, dayOfMonth, n) → n rows on 2024-01-<day>
    counts.flatMap { case (k, d, n) =>
      Seq.fill(n)((k, f"2024-01-$d%02d 12:00:00"))
    }.toDF("key", "tss").withColumn("ts", to_timestamp(col("tss")))

  test("closed form equals the textbook clamp recurrence") {
    // counts (5,5,20,20), k = 50 div 4 = 12, d = (-7,-7,8,8):
    // recurrence S = max(0, S+d) → (0,0,8,16); closed form
    // P = (-7,-14,-6,2), S = P − min(0, runmin P) = (0,0,8,16).
    val df = eventsFor(Seq(("a", 1, 5), ("a", 2, 5), ("a", 3, 20), ("a", 4, 20)))
    val out = Changepoint.cusumDaily(df, "key", "ts")
      .orderBy("day").select("n_events", "k", "cusum")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((5L, 12L, 0L), (5L, 12L, 0L),
      (20L, 12L, 8L), (20L, 12L, 16L)))
  }

  test("a sustained level shift fires the alarm, single spikes do not") {
    // 10/day for 10 days then 30/day for 5: k = 250 div 15 = 16,
    // S accumulates 14/day after the shift and crosses 4k = 64 only on
    // the final day (42, 56, 70).
    val df = eventsFor((1 to 10).map(d => ("a", d, 10)) ++
      (11 to 15).map(d => ("a", d, 30)))
    val out = Changepoint.cusumDaily(df, "key", "ts")
      .orderBy("day").select("day", "cusum", "alarm")
      .as[(java.sql.Date, Long, Boolean)].collect().toSeq
    assert(out.count(_._3) === 1)
    assert(out.last._2 === 70L && out.last._3)
    // steady-state days never alarm
    assert(out.take(10).forall(r => r._2 === 0L && !r._3))
  }

  test("keys are independent: a quiet key stays quiet beside a noisy one") {
    val df = eventsFor(Seq(("quiet", 1, 3), ("quiet", 2, 3),
      ("noisy", 1, 1), ("noisy", 2, 100)))
    val out = Changepoint.cusumDaily(df, "key", "ts")
      .filter(col("key") === "quiet")
      .select("cusum").as[Long].collect().toSeq
    assert(out === Seq(0L, 0L))
  }

  test("locateShift finds the split day and the exact pre/post means") {
    // 10/day on days 1-4, 30/day on days 5-8: split after day 4 —
    // D_t = 8·P_t − t·160 peaks (|−80|... ) at t = 4: P4 = 40,
    // D4 = 320 − 640 = −320; pre mean 10.000, post mean 30.000
    val df = eventsFor((1 to 4).map(d => ("a", d, 10)) ++
      (5 to 8).map(d => ("a", d, 30)))
    val out = Changepoint.locateShift(df, "key", "ts")
      .select("split_day", "n_days", "d_stat", "pre_mean_milli",
        "post_mean_milli", "shift_milli")
      .as[(java.sql.Date, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(out === Seq((java.sql.Date.valueOf("2024-01-04"), 8L, 320L,
      10000L, Some(30000L), Some(20000L))))
  }

  test("locateShift on a flat series picks the earliest day, NULL-safe") {
    // constant 5/day: every D_t = 0, tie rule → day 1; post mean exists
    val df = eventsFor((1 to 4).map(d => ("a", d, 5)))
    val out = Changepoint.locateShift(df, "key", "ts")
      .select("split_day", "d_stat", "shift_milli")
      .as[(java.sql.Date, Long, Option[Long])].collect().toSeq
    assert(out === Seq((java.sql.Date.valueOf("2024-01-01"), 0L, Some(0L))))
    // single-day key: the split IS the last day → NULL post mean
    val one = eventsFor(Seq(("b", 1, 7)))
    val o1 = Changepoint.locateShift(one, "key", "ts")
      .select("post_mean_milli").as[Option[Long]].collect().toSeq
    assert(o1 === Seq(None))
  }

  test("segmented trend separates a ramp from a step, exact integer slopes") {
    // days 1..6 flat at 10 (slope 0), days 7..12 ramping 20,25,..,45
    // (slope 5/day): the located split is inside [6, 7); the pre side
    // must read ~0 and the post side exactly 5e6 micro/day.
    val df = eventsFor((1 to 6).map(d => ("a", d, 10)) ++
      (7 to 12).map(d => ("a", d, 20 + 5 * (d - 7))))
    val out = Changepoint.segmentedTrend(df, "key", "ts")
      .as[(String, java.sql.Date, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().head
    val (_, splitDay, nPre, nPost, preS, postS, change) = out
    assert(nPre + nPost === 12L)
    // exact replay on whichever split locateShift picked
    val daily = (1 to 6).map(d => (d, 10L)) ++
      (7 to 12).map(d => (d, 20L + 5L * (d - 7)))
    val splitDom = splitDay.toLocalDate.getDayOfMonth
    def slopeOf(side: Seq[(Int, Long)]): Option[Long] =
      if (side.size < 2) None
      else {
        val n = BigInt(side.size)
        val xs = side.map(p => BigInt(p._1)); val ys = side.map(p => BigInt(p._2))
        val sx = xs.sum; val sy = ys.sum
        val sxx = xs.map(x => x * x).sum
        val sxy = side.map(p => BigInt(p._1) * p._2).sum
        val varx = n * sxx - sx * sx
        if (varx == 0) None
        else Some((BigInt(1000000) * (n * sxy - sx * sy) / varx).toLong)
      }
    // x in the op is epoch-day; slope is translation-invariant so the
    // day-of-month replay gives identical slopes
    val (pre, post) = daily.partition(_._1 <= splitDom)
    assert(preS === slopeOf(pre) && postS === slopeOf(post))
    assert(postS.contains(5000000L), "the ramp side must read exactly 5/day")
    // locateShift picks the max-|deviation| day, which on a flat+ramp
    // series can sit a little inside the ramp — the broken-stick READ
    // (post side steeper than pre) holds wherever the split lands
    assert(preS.get < postS.get, "the post side must be the steeper stick")
    assert(change === Some(postS.get - preS.get))
  }

  test("segmented trend: a 1-day side reads NULL, not a fake slope") {
    // shift on the LAST day → post side is a single day
    val df = eventsFor((1 to 9).map(d => ("a", d, 10)) ++ Seq(("a", 10, 100)))
    val out = Changepoint.segmentedTrend(df, "key", "ts")
      .as[(String, java.sql.Date, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().head
    assert(out._4 === 1L && out._6 === None && out._7 === None)
  }
}
