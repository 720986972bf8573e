package graft

import org.apache.spark.sql.functions._

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("typed star join compiles against case-class fields and agrees with SQL") {
    val li = Tables.lineitem(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)

    // typed field access — compile-time checked
    val typedRevenue = li
      .filter(_.l_returnflag == "R")
      .joinWith(ord, li("l_orderkey") === ord("o_orderkey"))
      .map { case (l, o) => (o.o_orderpriority, l.l_extendedprice * (1 - l.l_discount)) }
      .groupByKey(_._1)
      .count()
      .collect().toMap

    val sqlCounts = li.toDF().filter(col("l_returnflag") === "R")
      .join(ord.toDF(), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()
      .as[(String, Long)].collect().toMap

    assert(typedRevenue === sqlCounts)
  }

  test("typed documents and embeddings load with expected shapes") {
    val docs = Tables.documents(spark, sf0001)
    assert(docs.head().text.nonEmpty)
    val emb = Tables.embeddings(spark, sf0001)
    assert(emb.head().embedding.length === 64)
  }
}
