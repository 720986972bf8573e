package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stationary distribution of the consecutive-event chain — the ergodic
  * companion to [[MarkovAttribution]]'s absorbing chains: iterate
  * π' = πP to its fixed point and compare the chain's LONG-RUN mix with
  * the marginal mix actually observed. When the two disagree, the
  * process is drifting — the transition structure pushes toward a
  * different regime than today's snapshot shows — which makes the gap a
  * leading indicator where `drift_event_mix` (two-window comparison) is
  * a trailing one.
  *
  * Exactness: the pinned rounds iterate in BigInt micro units —
  * raw(t) = Σ_s (π(s)·cnt(s,t)) div out(s) with per-edge truncating
  * division, then renormalize π'(t) = 10⁶·raw(t) div Σraw — so the
  * DuckDB oracle replays every round digit for digit as chained CTEs
  * (the [[MarkovAttribution]]/[[BradleyTerry]] discipline). K rounds is
  * part of the contract, not a convergence heuristic.
  *
  * Scale: one per-user LEAD window + one map-side-combined (from, to)
  * count (the `event_transition_matrix` passes); the driver iterates
  * over the bounded state-pair matrix (capped probe + loud require).
  */
object MarkovChain {

  /** One row per observed state: (event_type, n_events,
    * empirical_permille, stationary_permille), event_type order.
    * `trans` carries (from_type, to_type, n); `marginal` carries
    * (event_type, n_events). Every state appearing anywhere in `trans`
    * must have outgoing transitions (an absorbing state has no
    * stationary mix in this construction — fails loudly).
    */
  def stationaryMix(trans: DataFrame, marginal: DataFrame,
                    rounds: Int = 12, maxStates: Int = 64): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"stationaryMix: rounds=$rounds outside 1..64")
    val spark = trans.sparkSession
    val cap = maxStates * maxStates
    val rows = trans.select(col("from_type"), col("to_type"),
      col("n").cast("long")).limit(cap + 1).collect()
    require(rows.length <= cap,
      s"stationaryMix: > $cap transition cells — aggregate to a bounded " +
        "state key first")
    require(rows.nonEmpty, "stationaryMix: no transitions")
    val cnt = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val states = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.sorted
    val out = states.map(s =>
      s -> cnt.collect { case ((a, _), c) if a == s => c }.sum).toMap
    require(out.values.forall(_ > 0L),
      "stationaryMix: a state with no outgoing transitions (absorbing) — " +
        "the ergodic fixed point is undefined; route it like " +
        "MarkovAttribution's (conv)/(null) instead")

    val M = BigInt(1000000)
    var pi: Map[String, BigInt] =
      states.map(_ -> M / states.length).toMap
    for (_ <- 1 to rounds) {
      val raw = states.map { t =>
        t -> states.map { s =>
          (pi(s) * BigInt(cnt.getOrElse((s, t), 0L))) / BigInt(out(s))
        }.sum
      }.toMap
      val total = raw.values.sum
      require(total > 0,
        "stationaryMix: the iterate truncated to zero — too few " +
          "transitions per state for micro units")
      pi = states.map(t => t -> (M * raw(t)) / total).toMap
    }
    import spark.implicits._
    val piDf = broadcast(states.map(s => (s, pi(s).toLong)).toSeq
      .toDF("event_type", "__pi"))
    marginal
      .join(piDf, Seq("event_type"), "left")
      .select(col("event_type"), col("n_events"),
        expr("(1000L * n_events) div (SUM(n_events) OVER ())")
          .as("empirical_permille"),
        expr("coalesce(__pi div 1000L, 0L)").as("stationary_permille"))
      .orderBy(col("event_type"))
  }
}
