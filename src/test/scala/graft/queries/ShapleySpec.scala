package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Shapley attribution query must satisfy the axioms the closed form
  * is supposed to guarantee — checked on the real fixture through the
  * declared query itself (the query is the unit here; its oracle pins the
  * values, these pin the PROPERTIES).
  */
class ShapleySpec extends SparkSpec {
  import spark.implicits._

  private def run() = Registry.all.find(_.name == "shapley_attribution").get
    .fn(spark, "/root/testdata/sf0.001")
    .select("channel", "phi_sixths", "share_milli", "conversions")
    .as[(String, Long, Long, Long)].collect()

  test("efficiency: the six-scaled values sum exactly to 6·v(C)") {
    val rows = run()
    assert(rows.nonEmpty)
    val vc = rows.head._4
    assert(rows.map(_._4).distinct.length === 1, "one conversion total")
    assert(rows.map(_._2).sum === 6L * vc,
      "Shapley efficiency must hold exactly in sixths")
  }

  test("every channel credit is non-negative (presence game is monotone)") {
    run().foreach { case (ch, phi6, share, _) =>
      assert(phi6 >= 0L, s"negative credit for $ch")
      assert(share >= 0L && share <= 1000L)
    }
  }
}
