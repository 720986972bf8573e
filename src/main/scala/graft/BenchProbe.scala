package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.{MinHash, SimHash}

/** Ad-hoc stage-level profiler for the heavier operators (dev tool, not part
  * of the driver contract).
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // With query names as args: time those declared queries at $dir.
    // Without args: the original minhash/simhash stage breakdown.
    if (args.nonEmpty) {
      val byName = queries.Registry.all.map(q => q.name -> q.fn).toMap
      val unknown = args.filterNot(byName.contains)
      require(unknown.isEmpty,
        s"unknown queries: ${unknown.mkString(", ")}; valid: ${byName.keys.toSeq.sorted.mkString(", ")}")
      args.foreach { name =>
        time(name)(byName(name)(spark, dir).count())
      }
    } else {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.cache().count()

      time("minhash signatures")(
        MinHash.signatures(docs, "doc_id", "text").count())
      time("minhash nearDupPairs")(
        MinHash.nearDupPairs(docs, "doc_id", "text").count())
      time("simhash fingerprints")(
        SimHash.fingerprints(docs, "doc_id", "text").count())
      time("simhash nearDupPairs")(
        SimHash.nearDupPairs(docs, "doc_id", "text", maxHamming = 10).count())
    }

    spark.stop()
  }
}
