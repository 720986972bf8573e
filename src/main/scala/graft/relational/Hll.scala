package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Portable HyperLogLog distinct-count sketch with its own accuracy audit
  * (Flajolet et al. 2007) — the REGISTER member of the cardinality family,
  * beside [[Kmv]]'s bottom-k values and the built-in HLL++ binary of
  * `approx_distinct_users`. Where KMV's state is k hash VALUES, HLL's is
  * m = 64 five-bit MAXIMA (register j keeps the largest
  * leading-zero rank seen among hashes routed to j), so the sketch is a
  * fixed 64-cell frame per group whatever the cardinality, merges by
  * cellwise MAX (no distinct pass anywhere — max absorbs duplicates on
  * the map side, which is HLL's operational edge over KMV at 100 TB: the
  * ONE aggregation is (group, register) → max, map-side combined), and
  * every cell is replayable in any engine.
  *
  * Exactness: h is the house 60-bit md5 slice; register = top 6 bits,
  * rank ρ = leading zeros of the remaining 54 bits + 1, computed WITHOUT
  * floats as 55 − length(bin(w)) — `bin` renders the minimal binary
  * string in both Spark and DuckDB (bin(5) = '101'), so ρ is
  * string-length arithmetic, never floor(log2). The harmonic sum
  * Σ 2^(−M_j) is dyadic: scaled by 2⁵⁵ it is the exact long
  * Σ 2^(55−M_j) (empty registers contribute 2⁵⁵ each, total ≤ 2⁶¹), and
  * the estimate α₆₄·m²/Σ2^(−M) becomes one truncating DECIMAL(38,0)
  * division (709·4096·2⁵⁵)··· div (1000·S) with α₆₄ = 0.709, the paper's
  * m = 64 constant, carried as the exact rational 709/1000.
  *
  * The small-range branch (E ≤ 5m/2 with empty registers → linear
  * counting m·ln(m/V)) is NOT folded in: ln is IEEE-library-dependent,
  * not portably exact, so the frame emits the branch's exact INGREDIENTS
  * (`empty_registers`, the `small_range` flag) and keeps `hll_estimate`
  * on the raw formula — a caller who wants the correction applies
  * m·ln(m/V) to flagged rows; the gated audit measures the raw
  * estimator's error honestly instead of hiding it.
  *
  * Scale: one (group, register) max aggregation — 64 cells per group out
  * of the map side however many rows in — then a 64-row-per-group sum;
  * the exact audit side is the only distinct pass, and it exists only
  * because this IS the audit (drop `exact` for the production sketch).
  */
object Hll {

  private val m = 64
  private val wBits = 54 // 60-bit hash minus the 6 register-index bits

  /** The per-group register frame (g, r, mj) — the sketch STATE itself,
    * exposed because HLL's whole operational point is that states merge
    * by cellwise MAX: window/shard/day unions are one more grouped max
    * over these rows (see `rolling_hll_wau`). */
  def registers(df: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.select(col(groupCol).as("g"),
      graft.functions.HashFunctions.md5Bits60(
        col(idCol).cast("string")).as("h"))
      .select(col("g"), expr(s"h div ${1L << wBits}L").as("r"),
        expr(s"h % ${1L << wBits}L").as("w"))
      // rho stays INT (shiftleft's shift operand type under ANSI)
      .withColumn("rho",
        when(col("w") === 0L, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(bin(col("w")))))
      .groupBy(col("g"), col("r")).agg(max(col("rho")).as("mj"))

  /** Estimate per group from a register frame (g, r, mj): (g,
    * empty_registers, hll_estimate). Works on ANY (g, r, mj) rows —
    * including merged ones — as long as each (g, r) appears once. */
  def estimateFromRegisters(regs: DataFrame): DataFrame =
    regs.groupBy(col("g"))
      .agg((sum(expr(s"shiftleft(1L, ${wBits + 1} - mj)")) +
        (lit(m.toLong) - count(lit(1))) * lit(1L << (wBits + 1))).as("__s"),
        (lit(m.toLong) - count(lit(1))).as("empty_registers"))
      .select(col("g"), col("empty_registers"),
        // both sides DECIMAL(38,0): 1000·S reaches ~2.3e21 (64 empty
        // registers), past 2⁶³ — a long denominator ANSI-overflows
        expr(s"(CAST(709 AS DECIMAL(38,0)) * ${m * m} * ${1L << (wBits + 1)}L)" +
          " div (1000 * CAST(__s AS DECIMAL(38,0)))").as("hll_estimate"))

  /** Frozen linear-counting correction table: V (empty registers, 1..m) →
    * round(m·ln(m/V)), the small-range estimator of Flajolet et al. §4.
    * Neither engine computes ln at RUNTIME — the 64 values are materialized
    * once here from StrictMath (bit-reproducible across JVMs by spec) and
    * interpolated into the oracle SQL as the identical literals, so the
    * IEEE-libm portability hazard the scaladoc above refuses never arises:
    * both engines share one frozen constant table, exactly like α₆₄ =
    * 709/1000. Bounded by construction (m entries, broadcast).
    */
  val linearCountingTable: Seq[(Long, Long)] =
    (1 to m).map(v =>
      (v.toLong, Math.round(m.toDouble * StrictMath.log(m.toDouble / v))))

  /** The table as a DuckDB VALUES list `(v, lc), ...` for oracle CTEs. */
  def linearCountingValuesSql: String =
    linearCountingTable.map { case (v, lc) => s"($v, $lc)" }.mkString(", ")

  /** Fold the linear-counting correction into a [[distinctAudit]]-shaped
    * frame: rows flagged `small_range` take the LUT estimate m·ln(m/V)
    * (V = empty_registers), the rest keep the raw harmonic estimate; both
    * error bands are emitted so the correction's value is MEASURED, not
    * asserted. The LUT join is a broadcast of 64 literal rows.
    */
  def withLinearCounting(audit: DataFrame): DataFrame = {
    val spark = audit.sparkSession
    import spark.implicits._
    val lut = broadcast(linearCountingTable.toDF("__v", "__lc"))
    audit
      .join(lut, col("empty_registers") === col("__v"), "left")
      .withColumn("corrected_estimate",
        when(col("small_range"), col("__lc")).otherwise(col("hll_estimate")))
      .withColumn("corrected_err_permille",
        expr("(1000L * (corrected_estimate - exact_distinct)) div exact_distinct"))
      .drop("__v", "__lc")
  }

  /** Per-group frame (group, exact_distinct, empty_registers,
    * hll_estimate, small_range, err_permille), group order. */
  def distinctAudit(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val hashed = df.select(col(groupCol).as("g"),
      graft.functions.HashFunctions.md5Bits60(
        col(idCol).cast("string")).as("h"))
    val regs = hashed
      .select(col("g"), expr(s"h div ${1L << wBits}L").as("r"),
        expr(s"h % ${1L << wBits}L").as("w"))
      // rho stays INT (shiftleft's shift operand type under ANSI)
      .withColumn("rho",
        when(col("w") === 0L, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(bin(col("w")))))
      .groupBy(col("g"), col("r")).agg(max(col("rho")).as("mj"))
    val sums = regs.groupBy(col("g"))
      .agg((sum(expr(s"shiftleft(1L, ${wBits + 1} - mj)")) +
        (lit(m.toLong) - count(lit(1))) * lit(1L << (wBits + 1))).as("__s"),
        (lit(m.toLong) - count(lit(1))).as("empty_registers"))
    val exact = hashed.distinct().groupBy(col("g"))
      .agg(count(lit(1)).as("exact_distinct"))
    exact.join(sums, Seq("g"))
      .select(col("g").as(groupCol), col("exact_distinct"),
        col("empty_registers"),
        // both sides DECIMAL(38,0): 1000·S reaches ~2.3e21 (64 empty
        // registers), past 2⁶³ — a long denominator ANSI-overflows
        expr(s"(CAST(709 AS DECIMAL(38,0)) * ${m * m} * ${1L << (wBits + 1)}L)" +
          " div (1000 * CAST(__s AS DECIMAL(38,0)))").as("hll_estimate"))
      .withColumn("small_range",
        col("hll_estimate") <= (5L * m / 2) && col("empty_registers") > 0L)
      .withColumn("err_permille",
        expr("(1000L * (hll_estimate - exact_distinct)) div exact_distinct"))
      .orderBy(col(groupCol))
  }
}
