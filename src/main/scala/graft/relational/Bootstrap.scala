package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-weight bootstrap for per-group mean uncertainty —
  * the streaming-scale bootstrap of Chamandy, Muralidharan, Najmi & Naidu
  * ("Estimating uncertainty for massive data streams", Google 2012) with
  * the Poisson(1) resample weight replaced by a SEEDED HASH weight
  * w ∈ {0,1,2} (md5-prefix of row-id:replicate, mod 3 — mean exactly 1),
  * so every replicate is reproducible from the data alone: no RNG state,
  * no sampling seed to ship, identical on any cluster layout. A point
  * estimate without a band invites overreading; this prices the band in
  * one distributed pass.
  *
  * Exactness: money stays in exact cents (the Dsl decimal rule); each
  * replicate mean is (10⁴·Σ w·cents) div (Σ w) in DECIMAL(38,0) with the
  * BIGINT-returning IntegralDivide — truncating micro currency units,
  * engine-portable. The B replicate means per group are an answer-sized
  * frame; the 5th/95th order statistics are picked by rank, not
  * interpolation, so the band is exact integers too.
  *
  * Scale: one row-local replicate explode (B× the input of the PROJECTED
  * two columns, map-side combined immediately), one keyed aggregation to
  * (group × B) cells, and a window over B rows per group — no corpus
  * window, no driver collect. Weight class {0,1,2} keeps the blowup a
  * bounded constant; Σw ≈ n per replicate, so bands tighten as 1/√n like
  * the true bootstrap.
  */
object Bootstrap {

  /** Per-group frame: (group, n_rows, mean_micro, boot_lo_micro,
    * boot_hi_micro, boot_spread_micro) — full-sample truncating micro
    * mean plus the [k_lo, k_hi] replicate-mean order statistics with
    * k_lo = ⌈0.05·B⌉, k_hi = ⌈0.95·B⌉. `idCol` must be a per-row unique
    * key (the hash seed); groups where some replicate draws all-zero
    * weights fail loudly (only possible for tiny groups — bootstrap
    * bands on a handful of rows are noise anyway).
    */
  def meanCi(df: DataFrame, groupCol: String, idCol: String,
             moneyCol: Column, replicates: Int = 32): DataFrame = {
    require(replicates >= 8 && replicates <= 256,
      s"bootstrap: replicates=$replicates outside 8..256 — fewer than 8 " +
        "cannot place a 5th percentile; more than 256 is resample overkill")
    val cents = (moneyCol.cast(org.apache.spark.sql.types.DecimalType(12, 2))
      * 100).cast("long")
    val base = df.select(col(groupCol).as("g"), col(idCol).cast("string").as("__id"),
      cents.as("__c"))
    val reps = base
      .withColumn("__b", explode(typedLit((0 until replicates).map(_.toLong))))
      .withColumn("__w",
        pmod(graft.functions.HashFunctions.md5Bits60(
          concat_ws(":", col("__id"), col("__b"))), lit(3L)))
    val cell = reps.groupBy(col("g"), col("__b"))
      .agg(sum(col("__w")).as("__sw"),
        sum(col("__w") * col("__c")).as("__swc"))
    val means = cell.select(col("g"), col("__b"),
      when(col("__sw") > 0,
        expr("(10000L * CAST(__swc AS DECIMAL(38,0))) div __sw"))
        .as("__m"))
    val w = Window.partitionBy(col("g")).orderBy(col("__m"), col("__b"))
    val kLo = (replicates * 5 + 99) / 100
    val kHi = (replicates * 95 + 99) / 100
    val band = means
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("__nb"),
        sum(when(col("__m").isNull, 1L).otherwise(0L)).as("__bad"),
        max(when(col("__rn") === kLo, col("__m"))).as("boot_lo_micro"),
        max(when(col("__rn") === kHi, col("__m"))).as("boot_hi_micro"))
    val full = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"),
        expr("(10000L * CAST(SUM(__c) AS DECIMAL(38,0))) div COUNT(*)")
          .as("mean_micro"))
    val out = full.join(band, Seq("g"))
    // loud-misuse contract: a NULL replicate mean means Σw = 0 somewhere
    val bad = out.filter(col("__bad") > 0).limit(1).collect()
    require(bad.isEmpty,
      s"bootstrap: group '${bad.headOption.map(_.get(0)).orNull}' drew a " +
        "zero-weight replicate — the group is too small for a resample band")
    out.select(col("g").as(groupCol), col("n_rows"), col("mean_micro"),
      col("boot_lo_micro"), col("boot_hi_micro"),
      (col("boot_hi_micro") - col("boot_lo_micro")).as("boot_spread_micro"))
      .orderBy(col(groupCol))
  }
}
