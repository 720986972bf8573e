package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("assignment is deterministic, salt-sensitive, and roughly balanced") {
    val users = (1L to 400L).map(u => Tuple1(u)).toDF("u")
    val a1 = users.select(col("u"), Experiment.arm(col("u"), "s1").as("arm"))
      .as[(Long, Long)].collect().toMap
    val a2 = users.select(col("u"), Experiment.arm(col("u"), "s1").as("arm"))
      .as[(Long, Long)].collect().toMap
    assert(a1 === a2, "same salt must reassign identically")
    val b = users.select(col("u"), Experiment.arm(col("u"), "s2").as("arm"))
      .as[(Long, Long)].collect().toMap
    assert(a1.keys.count(u => a1(u) != b(u)) > 100,
      "a different salt must reshuffle a substantial share")
    val n0 = a1.values.count(_ == 0L)
    assert(n0 > 140 && n0 < 260, s"50/50 split out of balance: $n0/400")
  }

  test("SRM flag fires exactly at the frozen critical value") {
    // craft arms by picking users whose arm is known, sizes 100 vs 60:
    // chi2 = (40²/160)·1e6 = 10,000,000 micro > 3,841,459 → flag
    val users = (1L to 100000L).map(u => Tuple1(u)).toDF("u")
      .select(col("u"), Experiment.arm(col("u"), "x").as("arm"))
      .as[(Long, Long)].collect()
    val picked = users.filter(_._2 == 0L).take(100) ++
      users.filter(_._2 == 1L).take(60)
    val ev = picked.map { case (u, _) => (u, "view") }.toSeq
      .toDF("user_id", "event_type")
    val row = Experiment.srmConversionCheck(ev, "user_id",
      col("event_type") === "purchase", "x")
      .select("n_a", "n_b", "srm_chi2_micro", "srm_flag")
      .as[(Long, Long, Long, Boolean)].collect().head
    assert((row._1, row._2) === ((100L, 60L)))
    assert(row._3 === 1000000L * 40 * 40 / 160)
    assert(row._4)
  }

  test("hash uniformity: chi2 matches the hand cross-multiplied form; empty buckets count") {
    // 32 units: chi2 should be small and uniform_ok true
    val df = (1L to 32L).map(Tuple1(_)).toDF("u")
    val row = Experiment.hashUniformityAudit(df, "u", "s")
      .select("n_units", "n_buckets", "chi2_micro", "uniform_ok")
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(row._1 === 32L && row._2 === 16L)
    // local reference with the same md5 arms
    val arms = df.select(Experiment.arm(col("u"), "s", 16).as("b"))
      .as[Long].collect()
    val counts = (0 until 16).map(b => arms.count(_ == b.toLong).toLong)
    val ss = counts.map(o => { val d = 16L * o - 32L; BigInt(d) * d }).sum
    assert(row._3 === (BigInt(1000000) * ss / (16L * 32L)).toLong)
    // a deliberately skewed bucketing must flag: all units in one bucket
    // is not reachable through md5, so check the arithmetic directly
    val skewSs = { val d = 16L * 32L - 32L; BigInt(d) * d } // one bucket has all
    val skewChi = BigInt(1000000) * (skewSs + 15 * BigInt(32L * 32L)) / (16L * 32L)
    assert(skewChi.toLong > Experiment.Chi2Crit15Micro)
  }

  test("quantile shift: exact per-arm picks match a local sort") {
    val rows = (1L to 600L).map(i => (i, i, (i * 37L) % 1000L))
    val df = rows.toDF("user_id", "event_id", "v")
    val out = Experiment.quantileShift(df, "user_id", "event_id", col("v"), "q1")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    val arms = df.select(col("user_id"),
      Experiment.arm(col("user_id"), "q1").as("a")).as[(Long, Long)]
      .collect().toMap
    def pick(arm: Long, q: Long): Long = {
      val vs = rows.filter(r => arms(r._1) == arm)
        .sortBy(r => (r._3, r._2)).map(_._3)
      vs(((q * vs.length + 999) / 1000).toInt - 1)
    }
    assert(out._3 === pick(0L, 500L) && out._4 === pick(0L, 900L))
    assert(out._5 === pick(1L, 500L) && out._6 === pick(1L, 900L))
    assert(out._7 === 1000L * (out._5 - out._3) / out._3)
  }

  test("quantile shift refuses an empty arm loudly") {
    // a single unit lands in one arm only
    val df = Seq((7L, 1L, 10L)).toDF("user_id", "event_id", "v")
    intercept[IllegalArgumentException] {
      Experiment.quantileShift(df, "user_id", "event_id", col("v"), "q1")
    }
  }

  test("CUPED on a correlated covariate: theta exact, baseline imbalance removed") {
    // y = 3x + small noise, and x is DELIBERATELY imbalanced by arm (odd
    // vs even residues): the raw lift is dominated by 3·Δx̄ baseline
    // imbalance, and CUPED must (a) find θ ≈ 3 and ρ² ≈ 1, (b) reproduce
    // the exact integer formula, (c) shrink the lift toward the
    // noise-only difference by removing the covariate term.
    val rows = (1L to 400L).map { i =>
      val arm = i % 2
      val x = 50L + (i * 37L) % 100L
      val y = 3L * x + ((i * 17L) % 21L) - 10L
      (arm, x, y)
    }
    val df = rows.toDF("arm", "x", "y")
    val out = Experiment.cupedAdjustedLift(df)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (n, theta, rho2, raw, adj) = out
    assert(n === 400L)
    val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val sxx = rows.map(r => BigInt(r._2) * r._2).sum
    val sxy = rows.map(r => BigInt(r._2) * r._3).sum
    val A = BigInt(400) * sxy - BigInt(sx) * sy
    val B = BigInt(400) * sxx - BigInt(sx) * sx
    val thetaRef = BigInt(1000000) * A / B
    assert(theta === thetaRef.toLong)
    assert(theta > 2900000L && theta < 3100000L, s"theta=$theta not ~3")
    assert(rho2 > 950L, s"rho2=$rho2: the linear covariate must dominate")
    // exact local replay of the adjusted-lift formula
    def armSums(a: Long) = {
      val s = rows.filter(_._1 == a)
      (BigInt(s.size), BigInt(s.map(_._2).sum), BigInt(s.map(_._3).sum))
    }
    val (na, sxa, sya) = armSums(0L); val (nb, sxb, syb) = armSums(1L)
    def adjScaled(syArm: BigInt, sxArm: BigInt, nArm: BigInt) =
      BigInt(1000000) * 400 * syArm - thetaRef * (400 * sxArm - nArm * sx)
    val adjRef = BigInt(1000) * (adjScaled(syb, sxb, nb) * na -
      adjScaled(sya, sxa, na) * nb) / (BigInt(1000000) * 400 * na * nb)
    assert(adj === adjRef.toLong)
    assert(math.abs(adj) < math.abs(raw) / 5,
      s"raw=$raw adj=$adj: baseline imbalance not removed")
  }

  test("CUPED refuses a constant covariate loudly") {
    val df = (1L to 50L).map(i => (i % 2, 7L, i)).toDF("arm", "x", "y")
    val e = intercept[Exception] {
      Experiment.cupedAdjustedLift(df).collect()
    }
    assert(e.getMessage.contains("cuped") ||
      Option(e.getCause).exists(_.getMessage.contains("cuped")))
  }

  test("CUPED refuses an empty arm loudly instead of returning zero rows") {
    // the old filtered-broadcast crossJoin silently yielded an EMPTY frame
    // when one arm had no units — no row, no error; the conditional-agg
    // form always emits its one row, and the guard raises on it
    val df = (1L to 50L).map(i => (0L, i % 7, i)).toDF("arm", "x", "y")
    val e = intercept[Exception] {
      Experiment.cupedAdjustedLift(df).collect()
    }
    assert(e.getMessage.contains("empty arm") ||
      Option(e.getCause).exists(_.getMessage.contains("empty arm")))
  }

  test("balanced A/A on the fixture: no SRM flag, conversions within noise") {
    val ev = graft.queries.Dsl.events(spark, sf0001)
    val row = Experiment.srmConversionCheck(ev, "user_id",
      col("event_type") === "purchase", "exp1")
      .select("srm_flag").as[Boolean].collect().head
    assert(!row, "md5 assignment must not trip SRM on null data")
  }
}
