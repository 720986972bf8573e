package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized parity for the round-6 vector/text operators against
  * sequential driver references (same discipline as OperatorParitySpec).
  */
class VectorParitySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], trials: Int): Seq[A] =
    (1 to trials).flatMap(i => g.apply(Gen.Parameters.default, Seed(777L + i)))

  private val vecGen: Gen[Seq[(Long, Seq[Float])]] = for {
    n <- Gen.chooseNum(6, 20)
    vs <- Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-500, 500).map(_ / 1000.0f)))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }

  private def q(x: Float): Long = math.floor(x.toDouble * 1000000.0).toLong

  test("k-center greedy matches a sequential reference") {
    samples(vecGen, 5).foreach { rows =>
      val got = Coreset.kCenterGreedy(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 4)
        .as[(Long, Long, Long)].collect().sortBy(_._1).map(r => (r._2, r._3)).toSeq

      // sequential reference on the same quantized integers
      val qv = rows.map { case (id, v) => id -> v.map(q) }
      def d2(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val seed = qv.map { case (id, v) => (id, v.map(x => x * x).sum) }
        .sortBy { case (id, n) => (-n, id) }.head
      var sel = Vector((seed._1, seed._2))
      var mind = qv.map { case (id, v) =>
        id -> d2(v, qv.find(_._1 == seed._1).get._2) }.toMap
      (2 to 4).foreach { _ =>
        val remaining = qv.filterNot(p => sel.exists(_._1 == p._1))
        if (remaining.nonEmpty) {
          val pick = remaining.map(p => (p._1, mind(p._1)))
            .sortBy { case (id, d) => (-d, id) }.head
          sel :+= pick
          val pv = qv.find(_._1 == pick._1).get._2
          mind = qv.map { case (id, v) => id -> math.min(mind(id), d2(v, pv)) }.toMap
        }
      }
      assert(got === sel.toSeq, s"rows: $rows")
    }
  }

  test("per-class outliers match a sequential reference") {
    val labGen = vecGen.flatMap(rows =>
      Gen.listOfN(rows.length, Gen.chooseNum(0, 2)).map(ls =>
        rows.zip(ls).map { case ((id, v), l) => (id, v, l) }))
    samples(labGen, 5).foreach { rows =>
      val got = Outliers.perClassOutliers(
        rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", topK = 3)
        .select("label", "vec_id", "dist2n")
        .as[(Long, Long, Long)].collect().toSet

      def ql(x: Float): Long = math.floor(x.toDouble * 10000.0).toLong
      val expect = rows.groupBy(_._3).flatMap { case (lab, grp) =>
        val n = grp.length.toLong
        val dims = grp.head._2.indices
        val sums = dims.map(d => grp.map(r => ql(r._2(d))).sum)
        grp.map { r =>
          val dist = dims.map { d =>
            val t = n * ql(r._2(d)) - sums(d); t * t }.sum
          (lab.toLong, r._1, dist)
        }.sortBy { case (_, id, dN) => (-dN, id) }.take(3)
      }.toSet
      assert(got === expect, s"rows: $rows")
    }
  }

  test("decontamination report matches a sequential gram-set reference") {
    val docGen = for {
      n <- Gen.chooseNum(4, 10)
      texts <- Gen.listOfN(n, Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d"))
        .map(_.mkString(" ")))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    samples(docGen, 5).foreach { docs =>
      val k = 4
      val got = graft.text.Decontaminate.report(
        docs.toDF("doc_id", "text"), "doc_id", "text", k,
        col("doc_id") % 3 === 0)
        .select("doc_id", "n_grams", "n_hit")
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap

      def grams(t: String) = t.split(" ").sliding(k).map(_.mkString(" ")).toSet
      val evalSet = docs.filter(_._1 % 3 == 0).flatMap(d => grams(d._2)).toSet
      val expect = docs.filterNot(_._1 % 3 == 0).map { case (id, t) =>
        val g = grams(t)
        id -> ((g.size.toLong, g.count(evalSet.contains).toLong))
      }.toMap
      assert(got === expect, s"docs: $docs")
    }
  }
}
