package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized parity: every operator here is checked against a
  * straight-line driver-side reference implementation on generated data
  * (fixed seeds per trial — failures reproduce). This is the layer between
  * the hand-computed specs (edge semantics) and the DuckDB oracle rows
  * (fixture-shaped data): random shapes, including ties, duplicates, empty
  * keys and skew, must agree with the obviously-correct sequential form.
  */
class OperatorParitySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], trials: Int): Seq[A] =
    (1 to trials).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  // ---- as-of join: native exec vs driver reference ------------------------

  test("native as-of matches a sequential reference on random data") {
    val rightGen = Gen.listOfN(25, for {
      k <- Gen.chooseNum(1L, 4L); t <- Gen.chooseNum(0L, 60L)
    } yield (k, t)).map(_.distinct) // unique (key, time) → unambiguous match
    val leftGen = Gen.listOfN(30, for {
      k <- Gen.chooseNum(1L, 5L); t <- Gen.chooseNum(0L, 60L)
    } yield (k, t))
    val cases = samples(Gen.zip(leftGen, rightGen), 6)
    cases.foreach { case (lRows, rRows) =>
      val l = lRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val r = rRows.map { case (k, t) => (k, t, s"v$k-$t") }.toDF("k", "rt", "v")
      val got = graft.plans.NativeAsOf
        .backward(l, r, Seq("k"), "t", "rt", Seq("v"))
        .select("lid", "asof_v").as[(Long, Option[String])].collect().toMap
      val expect = lRows.zipWithIndex.map { case ((k, t), i) =>
        val m = rRows.filter(p => p._1 == k && p._2 <= t)
        i.toLong -> (if (m.isEmpty) None
                     else { val best = m.maxBy(_._2); Some(s"v${best._1}-${best._2}") })
      }.toMap
      assert(got === expect)
    }
  }

  // ---- skyline vs brute-force dominance -----------------------------------

  test("2-D front matches brute-force dominance on random points") {
    val ptsGen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0L, 12L)))
    samples(ptsGen, 6).foreach { pts =>
      val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y")
      val got = Skyline.front2D(df, "x", "y")
        .select("id").as[Long].collect().toSet
      val expect = pts.zipWithIndex.collect {
        case ((x, y), i) if !pts.exists { case (x2, y2) =>
          x2 >= x && y2 >= y && (x2 > x || y2 > y) } => i.toLong
      }.toSet
      assert(got === expect, s"points: $pts")
    }
  }

  // ---- prefix sums vs sequential scan -------------------------------------

  test("runningSum matches the sequential prefix on random unique ids") {
    val rowsGen = for {
      ids <- Gen.listOfN(30, Gen.chooseNum(-1000L, 1000L)).map(_.distinct)
      vals <- Gen.listOfN(30, Gen.chooseNum(-50L, 50L))
    } yield ids.zip(vals)
    samples(rowsGen, 6).foreach { rows =>
      val (out, total) = PrefixSum.runningSum(
        rows.toDF("id", "v"), "id", "v", "ps", numParts = 7)
      val got = out.select("id", "ps").as[(Long, Long)].collect().toMap
      var acc = 0L
      val expect = rows.sortBy(_._1).map { case (id, v) => acc += v; id -> acc }.toMap
      assert(got === expect)
      assert(total === rows.map(_._2).sum)
    }
  }

  test("groupedRunningSum matches per-group sequential prefixes") {
    val rowsGen = for {
      n <- Gen.chooseNum(10, 40)
      ids <- Gen.pick(n, (0L until 200L)).map(_.toSeq)
      gs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
      vs <- Gen.listOfN(n, Gen.chooseNum(0L, 9L))
    } yield ids.lazyZip(gs).lazyZip(vs).toList
    samples(rowsGen, 5).foreach { rows =>
      val out = PrefixSum.groupedRunningSum(
        rows.toDF("id", "g", "v"), "g", "id", "v", "ps", numParts = 5)
        .select("id", "ps").as[(Long, Long)].collect().toMap
      val expect = rows.groupBy(_._2).flatMap { case (_, grp) =>
        var acc = 0L
        grp.sortBy(_._1).map { case (id, _, v) => acc += v; id -> acc }
      }
      assert(out === expect)
    }
  }

  // ---- funnel vs driver simulation ----------------------------------------

  test("ordered funnel matches a sequential frontier simulation") {
    val stages = Seq("a", "b", "c")
    val evGen = Gen.listOfN(50, for {
      u <- Gen.chooseNum(1L, 6L); t <- Gen.oneOf(stages)
      s <- Gen.chooseNum(0L, 40L)
    } yield (u, t, s))
    samples(evGen, 6).foreach { evs =>
      val got = Funnel.conversion(evs.toDF("u", "t", "ts"), "u", "t", "ts", stages)
        .select("stage_idx", "n_users").as[(Long, Long)].collect().toMap
      val byUser = evs.groupBy(_._1)
      val expect = (1 to stages.length).map { depth =>
        depth.toLong -> byUser.values.count { rows =>
          var frontier = Option.empty[Long]
          var ok = true
          stages.take(depth).foreach { st =>
            if (ok) {
              val cand = rows.collect {
                case (_, t, ts) if t == st && frontier.forall(ts >= _) => ts
              }
              if (cand.isEmpty) ok = false else frontier = Some(cand.min)
            }
          }
          ok
        }.toLong
      }.toMap
      assert(got === expect, s"events: $evs")
    }
  }
}
