package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns — the
  * dimensionality-reduction stage a 100 TB ANN pipeline runs BEFORE
  * indexing: a Rademacher (±1) projection preserves pairwise cosines to
  * within ~1/√dimOut distortion (Achlioptas 2003, "Database-friendly random
  * projections"), and a 64→16 cut shrinks every downstream shuffle, index,
  * and scan of the vector column by 4×.
  *
  * Scale shape: the sign matrix is driver-literal (dimIn × dimOut entries —
  * KBs at any realistic width), so projection is a shuffle-free row-local
  * map of `dimOut` codegen'd `vec_dot` folds; nothing is trained, nothing
  * is broadcast, and the projection of a row is reproducible forever from
  * the seed string alone.
  *
  * Determinism: each sign is the top bit of md5("seed:i:j") — portable to
  * any engine with md5, and the projected values are the same sequential
  * double folds as the rest of the vector family, so projected scores
  * hash-match a DuckDB oracle embedding the identical literal matrix.
  */
object Projection {

  /** Deterministic Rademacher sign matrix: signs(j)(i) = ±1.0 from the top
    * bit of md5("seed:i:j"). Row-major by OUTPUT dimension so each row is
    * one projection component's weight vector.
    */
  def rademacherSigns(dimIn: Int, dimOut: Int, seed: String): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dimOut) { j =>
      Array.tabulate(dimIn) { i =>
        val h = md.digest(s"$seed:$i:$j".getBytes("UTF-8"))
        if ((h(0) & 0x80) == 0) 1.0 else -1.0
      }
    }
  }

  /** Project `vec` through the sign matrix: out(j) = dot(vec, signs(j)).
    * `dimOut` fused native dot folds over literal rows — row-local,
    * codegen'd, zero shuffle.
    */
  def project(vec: Column, signs: Array[Array[Double]]): Column =
    array(signs.map(row =>
      VectorFunctions.dot(vec, array(row.map(lit): _*))): _*)

  /** The sign matrix as a DuckDB list-of-lists literal, for oracle SQL. */
  def signsSqlLiteral(signs: Array[Array[Double]]): String =
    signs.map(_.map(v => if (v > 0) "1.0" else "-1.0")
      .mkString("[", ",", "]")).mkString("[", ",", "]")
}
