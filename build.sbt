ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kinesishandlerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass forked-run stdout through raw. The default LoggedOutput strategy
// prefixes every program line with "[info] ", which broke the driver's
// bench-JSON parse in rounds 1-2 (no stdout line started with '{').
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Ephemeral scratch (streaming temp checkpoints + WAL, parquet drain
// sinks, landed-stage files, shuffle spills) goes to tmpfs when the host
// has one: the AvailableNow micro-batch drains are fsync-bound, and on a
// throttled virtio disk their per-trigger commit latency dominated the
// stream_* bench rows with up to 4x run-to-run wobble (the r7-close vs
// r7-driver bench disagreement). tmpfs makes those fsyncs memcpys. This
// is the single-JVM LOCAL harness only — production deployments pass
// durable checkpoint locations explicitly (drainRoutedToParquet's
// checkpointDir) and configure cluster local dirs.
// Gated: GRAFT_TMPFS=0 opts out, and the redirect only engages when tmpfs
// has >= 16 GiB usable — shuffle spills and parquet drains landing in
// RAM-backed tmpfs on a small host would exhaust memory instead of
// spilling to disk, which is the opposite of what a spill is for.
javaOptions ++= {
  val shm = new java.io.File("/dev/shm")
  val minUsable = 16L * 1024 * 1024 * 1024
  if (sys.env.getOrElse("GRAFT_TMPFS", "1") != "0" &&
      shm.isDirectory && shm.canWrite && shm.getUsableSpace >= minUsable) {
    val d = new java.io.File(shm, "graft-tmp")
    d.mkdirs()
    Seq(s"-Djava.io.tmpdir=${d.getAbsolutePath}")
  } else Seq.empty
}
