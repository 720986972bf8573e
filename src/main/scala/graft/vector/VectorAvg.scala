package graft.vector

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregator (SURVEY.md §2.4 A5): element-wise mean of
  * fixed-dimension float vectors — the one aggregate the mandated surface
  * needs that Spark lacks as a built-in.
  *
  * `Aggregator[IN, BUF, OUT]` is the idiomatic custom-agg extension point:
  * Catalyst plans it as a proper two-phase aggregate (partial `reduce`
  * map-side, `merge` after the shuffle), so it scales exactly like built-in
  * aggregates — no `collect`, no UDF-per-row state.
  */
final class VectorAvg(dim: Int)
    extends Aggregator[Array[Float], VectorAvg.Buf, Array[Double]] {
  import VectorAvg.Buf

  override def zero: Buf = Buf(new Array[Double](dim), 0L)

  override def reduce(b: Buf, v: Array[Float]): Buf = {
    if (v != null && v.length == dim) {
      var i = 0
      while (i < dim) { b.sums(i) += v(i); i += 1 }
      Buf(b.sums, b.n + 1)
    } else b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    Buf(a.sums, a.n + b.n)
  }

  override def finish(b: Buf): Array[Double] =
    if (b.n == 0) new Array[Double](dim) else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object VectorAvg {
  final case class Buf(sums: Array[Double], n: Long)

  /** Column form, usable in `df.groupBy(...).agg(vectorAvg(dim, $"emb"))`. */
  def vectorAvg(dim: Int, column: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new VectorAvg(dim)).apply(column)
}
