package graft.relational

import graft.SparkSpec

/** Fixed-seed randomized parity for the round-7 profiling operators:
  * distributed results must equal sequential driver references on random
  * inputs — the fuzz layer that has caught real ANSI/contract bugs before.
  */
class ProfilingParitySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)

  test("SkewProfile.hotKeys matches a sequential computation on random keys") {
    for (trial <- 1 to 3) {
      val keys = Seq.fill(200 + trial * 100)(s"k${rnd.nextInt(20)}")
      val got = SkewProfile.hotKeys(keys.toDF("k"), "k", topK = 4)
        .select("key", "cnt", "share_permille", "uniform_x_permille", "salt_factor")
        .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (-r._2, r._1))
      val counts = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = keys.size.toLong
      val nk = counts.size.toLong
      val mx = counts.values.max
      val want = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(4)
        .map { case (k, c) =>
          (k, c, 1000L * c / total, 1000L * c * nk / total,
            (mx * nk + total - 1) / total)
        }
      assert(got.toSeq === want, s"trial $trial")
    }
  }

  test("QuantileRank.permilleRank matches the sort-based CDF on random values") {
    for (trial <- 1 to 3) {
      val vals = Seq.fill(150 + trial * 50)(rnd.nextInt(40).toLong)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = QuantileRank.permilleRank(df, "v", "r")
        .select("id", "r").as[(Long, Long)].collect().toMap
      val n = vals.size.toLong
      vals.zipWithIndex.foreach { case (v, i) =>
        val below = vals.count(_ < v).toLong
        assert(got(i.toLong) === 1000L * below / n,
          s"trial $trial id $i v $v")
      }
    }
  }

  test("RateAudit.peakRates matches a sequential sliding-window scan") {
    def ts(sec: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    for (trial <- 1 to 3) {
      val events = Seq.fill(300)((rnd.nextInt(5).toLong,
        rnd.nextInt(500).toLong))
      val got = RateAudit.peakRates(
        events.map { case (u, s) => (u, ts(s)) }.toDF("user_id", "ts"),
        "user_id", "ts", windowSec = 60L, maxPerWindow = 5L)
        .select("user_id", "n_events", "peak_in_window")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      events.groupBy(_._1).foreach { case (u, evs) =>
        val secs = evs.map(_._2).sorted
        val peak = secs.map(t => secs.count(s => s > t - 60 && s <= t)).max
        assert(got(u) === ((secs.size.toLong, peak.toLong)), s"trial $trial user $u")
      }
    }
  }

  test("Entropy.unigramEntropy matches a sequential bits fold") {
    for (trial <- 1 to 3) {
      val docs = (1L to 40L).map { id =>
        (id, Seq.fill(5 + rnd.nextInt(30))(s"w${rnd.nextInt(12)}").mkString(" "))
      }
      val got = graft.text.Entropy.unigramEntropy(
        docs.toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id", "entropy_bits").as[(Long, Long)].collect().toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ")
        val n = toks.length.toLong
        val want = toks.groupBy(identity).values.map { g =>
          val c = g.size.toLong
          c * (63 - java.lang.Long.numberOfLeadingZeros(n / c))
        }.sum
        assert(got(id) === want, s"trial $trial doc $id")
      }
    }
  }
}
