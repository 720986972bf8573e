package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytic MinHash-LSH banding design table — the S-curve
  * P(candidate | jaccard = s) = 1 − (1 − s^r)^b for every way to spend the
  * same signature budget (Leskovec–Rajaraman–Ullman, Mining of Massive
  * Datasets §3.4). [[graft.dedup.MinHash]] runs ONE (b, r) choice and
  * `lsh_band_stats` measures what it did on this corpus; this planner
  * shows the whole trade-off space BEFORE a 100 TB run commits: more rows
  * per band pushes the curve right (fewer false candidates, misses more
  * borderline dups), more bands pushes it left. Paired with the measured
  * `minhash_jaccard_calibration` row, config choice becomes table lookup.
  *
  * Exactness: the curve is evaluated as ONE SQL expression string —
  * left-associated multiplication chains inside CASE arms, no pow() —
  * that this object also hands to the DuckDB oracle VERBATIM
  * ([[srCaseSql]]/[[tbCaseSql]]), so both engines execute the identical
  * IEEE operation sequence on identical literal inputs and the doubles
  * hash-match bit for bit. The permille floor is one more shared op.
  *
  * Scale: a (configs × grid)-row literal frame — a planner, not a scan;
  * it costs the same at any corpus size.
  */
object LshPlan {

  /** The signature-budget-16 sweep: every (bands, rows/band) factorization
    * of 16 hashes. */
  val budget16: Seq[(Int, Int)] = Seq((16, 1), (8, 2), (4, 4), (2, 8))

  private def prod(term: String, n: Int): String =
    List.fill(n)(term).mkString("(", " * ", ")")

  /** `s^r` as a CASE over the planned r values — left-assoc multiply chain,
    * engine-portable. */
  def srCaseSql(rs: Seq[Int]): String =
    rs.distinct.sorted
      .map(r => s"WHEN rpb = $r THEN ${prod("sd", r)}")
      .mkString("CASE ", " ", " END")

  /** `(1−s^r)^b` as a CASE over the planned band counts. */
  def tbCaseSql(bs: Seq[Int]): String =
    bs.distinct.sorted
      .map(b => s"WHEN bands = $b THEN ${prod("tq", b)}")
      .mkString("CASE ", " ", " END")

  /** Design frame (bands, rows_per_band, s_permille, collision_prob,
    * collision_permille) over the jaccard grid 50‰..950‰, ordered
    * (rows_per_band, s_permille). */
  def sCurve(spark: SparkSession, configs: Seq[(Int, Int)] = budget16,
             stepPermille: Int = 50): DataFrame = {
    require(configs.nonEmpty && configs.forall { case (b, r) => b >= 1 && r >= 1 },
      "lshPlan: configs must be positive (bands, rows-per-band) pairs")
    require(stepPermille >= 10 && stepPermille <= 500,
      s"lshPlan: stepPermille=$stepPermille outside 10..500")
    require(configs.forall { case (b, r) => b <= 64 && r <= 64 },
      "lshPlan: bands/rows beyond 64 make the expression chain degenerate " +
        "(the curve is a step function there anyway)")
    import spark.implicits._
    val grid = for {
      (b, r) <- configs
      s <- stepPermille until 1000 by stepPermille
    } yield (b.toLong, r.toLong, s.toLong)
    grid.toDF("bands", "rpb", "s_permille")
      .withColumn("sd", expr("CAST(s_permille AS DOUBLE) / 1000.0"))
      .withColumn("sr", expr(srCaseSql(configs.map(_._2))))
      .withColumn("tq", expr("1.0 - sr"))
      .withColumn("tb", expr(tbCaseSql(configs.map(_._1))))
      .select(col("bands"), col("rpb").as("rows_per_band"), col("s_permille"),
        expr("1.0 - tb").as("collision_prob"),
        expr("CAST(floor((1.0 - tb) * 1000.0) AS BIGINT)")
          .as("collision_permille"))
      .orderBy(col("rows_per_band"), col("s_permille"))
  }
}
