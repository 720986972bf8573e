package graft.relational

import graft.SparkSpec

class FunnelWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  private def run(gap: Option[Long], evs: (Long, String, Long)*) =
    Funnel.conversion(
      evs.map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"), gap)
      .select("stage_idx", "n_users").as[(Long, Long)].collect()
      .sortBy(_._1).map(_._2).toSeq

  test("transition outside the window does not convert") {
    val evs = Seq(
      (1L, "view", 0L), (1L, "click", 100L), (1L, "purchase", 150L), // inside
      (2L, "view", 0L), (2L, "click", 4000L))                       // click too late
    assert(run(Some(3600L), evs: _*) === Seq(2L, 1L, 1L))
    assert(run(None, evs: _*) === Seq(2L, 2L, 1L)) // unbounded: click counts
  }

  test("window anchors per transition, not at funnel start") {
    // click at 3000s (inside 1h of view@0); purchase at 6500s — inside 1h of
    // the CLICK anchor (3500s gap... actually 3500s <= 3600) but far past 1h
    // from the view. Per-transition anchoring converts.
    val evs = Seq((1L, "view", 0L), (1L, "click", 3000L), (1L, "purchase", 6500L))
    assert(run(Some(3600L), evs: _*) === Seq(1L, 1L, 1L))
  }

  test("a too-late early stage can still convert via a later in-window occurrence") {
    // clicks at 5000 (late) and 2000 (in window): the 2000 one anchors;
    // purchase at 5500 is within 1h of 2000? 3500 <= 3600 → converts
    val evs = Seq((1L, "view", 0L), (1L, "click", 5000L), (1L, "click", 2000L),
      (1L, "purchase", 5500L))
    assert(run(Some(3600L), evs: _*) === Seq(1L, 1L, 1L))
  }

  test("boundary: a transition at exactly the gap converts") {
    val evs = Seq((1L, "view", 0L), (1L, "click", 3600L))
    assert(run(Some(3600L), evs: _*).take(2) === Seq(1L, 1L))
  }

  test("windowed funnel matches a sequential simulation on random event streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val stages = Seq("view", "click", "purchase")
    val gap = 10L
    val evGen = Gen.listOfN(40, for {
      u <- Gen.chooseNum(1L, 5L); t <- Gen.oneOf(stages)
      s <- Gen.chooseNum(0L, 50L)
    } yield (u, t, s))
    val cases = (1 to 6).flatMap(i =>
      evGen.apply(Gen.Parameters.default, Seed(31337L + i)))
    cases.foreach { evs =>
      val got = run(Some(gap), evs: _*)
      val expect = (1 to stages.length).map { depth =>
        evs.groupBy(_._1).values.count { rows =>
          var frontier = Option.empty[Long]
          var ok = true
          stages.take(depth).foreach { st =>
            if (ok) {
              val cand = rows.collect {
                case (_, t, ts) if t == st &&
                  frontier.forall(f => ts >= f && ts <= f + gap) => ts
              }
              if (cand.isEmpty) ok = false else frontier = Some(cand.min)
            }
          }
          ok
        }.toLong
      }
      assert(got === expect, s"events: $evs")
    }
  }
}
