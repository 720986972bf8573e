package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** Typed views of the test-fixture tables (`Dataset[T]` with case-class
  * encoders) for pipelines that want compile-time field checks; the dynamic
  * `DataFrame` surface in `queries/Dsl` remains the default.
  */
object Tables {

  final case class Region(r_regionkey: Int, r_name: String)
  final case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                            c_acctbal: Double, c_mktsegment: String)
  final case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
                            s_acctbal: Double)
  final case class Part(p_partkey: Long, p_name: String, p_brand: String,
                        p_type: String, p_size: Int, p_retailprice: Double)
  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                         o_totalprice: Double, o_orderdate: Timestamp,
                         o_orderpriority: String)
  final case class LineItem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                            l_linenumber: Int, l_quantity: Double,
                            l_extendedprice: Double, l_discount: Double,
                            l_tax: Double, l_returnflag: String,
                            l_linestatus: String, l_shipdate: Timestamp)
  final case class Document(doc_id: Long, text: String, lang: String,
                            source: String, n_chars: Long)
  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def region(s: SparkSession, dir: String): Dataset[Region] =
    { import s.implicits._; load(s, dir, "region").as[Region] }
  def nation(s: SparkSession, dir: String): Dataset[Nation] =
    { import s.implicits._; load(s, dir, "nation").as[Nation] }
  def customer(s: SparkSession, dir: String): Dataset[Customer] =
    { import s.implicits._; load(s, dir, "customer").as[Customer] }
  def supplier(s: SparkSession, dir: String): Dataset[Supplier] =
    { import s.implicits._; load(s, dir, "supplier").as[Supplier] }
  def part(s: SparkSession, dir: String): Dataset[Part] =
    { import s.implicits._; load(s, dir, "part").as[Part] }
  def orders(s: SparkSession, dir: String): Dataset[Order] =
    { import s.implicits._; loadTs(s, dir, "orders", "o_orderdate").as[Order] }
  def lineitem(s: SparkSession, dir: String): Dataset[LineItem] =
    { import s.implicits._; loadTs(s, dir, "lineitem", "l_shipdate").as[LineItem] }
  def documents(s: SparkSession, dir: String): Dataset[Document] =
    { import s.implicits._; load(s, dir, "documents").as[Document] }
  def embeddings(s: SparkSession, dir: String): Dataset[Embedding] =
    { import s.implicits._; load(s, dir, "embeddings").as[Embedding] }

  private def load(s: SparkSession, dir: String, name: String) =
    s.read.parquet(s"$dir/$name.parquet")

  // parquet ms-timestamps surface as TIMESTAMP_NTZ; java.sql.Timestamp
  // encoders want TIMESTAMP (session-local) — normalize at the boundary.
  private def loadTs(s: SparkSession, dir: String, name: String, tsCol: String) =
    load(s, dir, name).withColumn(tsCol,
      org.apache.spark.sql.functions.col(tsCol).cast("timestamp"))
}
