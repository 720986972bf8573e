package graft.routing

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based coverage (SURVEY.md §5.2): codec round-trips and the
  * routing partition invariant over randomized inputs (ScalaCheck
  * generators, fixed seeds per trial for reproducibility).
  */
class RoutingPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], trials: Int): Seq[A] =
    (1 to trials).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val payloadSchema = StructType(Seq(
    StructField("schema", StringType),
    StructField("data", StructType(Seq(
      StructField("schema", StringType),
      StructField("qty", LongType))))))

  private val idGen: Gen[String] = for {
    vendor <- Gen.identifier.map(s => s"com.${s.take(8)}")
    name <- Gen.identifier.map(_.take(8))
    v <- Gen.chooseNum(1, 9)
  } yield s"$vendor/$name/$v-0-0"

  test("property: base64+JSON encode/decode round trip is the identity") {
    samples(Gen.listOfN(20, for {
      env <- idGen; inner <- idGen; qty <- Gen.chooseNum(-1000L, 1000L)
    } yield (env, inner, qty)), trials = 5).foreach { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("env", "inner", "qty")
          .withColumn("event", struct(col("env").as("schema"),
            struct(col("inner").as("schema"), col("qty").as("qty")).as("data")))
        val wire = df.withColumn("kinesis",
          struct(EventCodec.encodeEvent(col("event")).as("data")))
          .drop("event")
        val back = EventCodec.withDecodedEvent(wire, payloadSchema)
          .select(col("event.schema"), col("event.data.schema"), col("event.data.qty"))
          .as[(String, String, Long)].collect().toList
        assert(back === rows)
      }
    }
  }

  test("property: every row lands in exactly one route") {
    val schemas = Seq("a/x/1", "b/y/1", "c/z/1")
    val registry = schemas.take(2).map(id => id -> Router.Registration(
      RegisteredSchema(id, Seq(NumRange("qty", Some(0), Some(100)))),
      identity[org.apache.spark.sql.DataFrame])).toMap
    val config = Router.Config("env/1", RegisteredSchema("env/1", Nil), registry)

    samples(Gen.listOfN(50, for {
      env <- Gen.oneOf("env/1", "env/2")
      inner <- Gen.oneOf(schemas :+ null)
      qty <- Gen.chooseNum(-50L, 150L)
    } yield (env, inner, qty)), trials = 5).foreach { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("env", "inner", "qty")
          .withColumn("event", struct(col("env").as("schema"),
            struct(col("inner").as("schema"), col("qty").as("qty")).as("data")))
        val routed = Router.route(df, config)
        val branchTotal = routed.branches.values.map(_.count()).sum
        val total = branchTotal + routed.badMessages.count() + routed.skipped.count()
        assert(total === rows.size.toLong)
        // branch rows really carry the branch's schema id and valid payloads
        routed.branches.foreach { case (id, bdf) =>
          val ok = bdf.filter(col("event.data.schema") =!= id ||
            col("event.data.qty") < 0 || col("event.data.qty") > 100).count()
          assert(ok === 0L)
        }
      }
    }
  }

  test("single-pass partitioned sink writes every route once") {
    val dir = java.nio.file.Files.createTempDirectory("routed").toString
    val schemas = Seq("a/x/1", "b/y/1")
    val registry = schemas.map(id => id -> Router.Registration(
      RegisteredSchema(id, Nil), identity[org.apache.spark.sql.DataFrame])).toMap
    val config = Router.Config("env/1", RegisteredSchema("env/1", Nil), registry)
    val df = Seq(
      ("env/1", "a/x/1"), ("env/1", "b/y/1"), ("env/1", "nope/n/1"), ("bad", "a/x/1"))
      .toDF("env", "inner")
      .withColumn("event", struct(col("env").as("schema"),
        struct(col("inner").as("schema")).as("data")))
    Router.writeRouted(df, config, dir)
    val back = spark.read.parquet(dir)
    val counts = back.groupBy(Router.TagCol).count()
      .as[(String, Long)].collect().toMap
    assert(counts === Map(
      "branch:a/x/1" -> 1L, "branch:b/y/1" -> 1L,
      Router.Skipped -> 1L, Router.BadMessage -> 1L))

    // the route tag is a physical partition column: a branch filter prunes
    // to that branch's directory instead of scanning every route
    val branchScan = back.filter(col(Router.TagCol) === "branch:a/x/1")
    val plan = branchScan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").trim.isEmpty,
      s"tag filter must prune partitions:\n$plan")
    assert(branchScan.count() === 1L)
  }

  test("fatal errors in handlers propagate as task failures (retry semantics)") {
    val df = Seq(("env/1", "a/x/1")).toDF("env", "inner")
      .withColumn("event", struct(col("env").as("schema"),
        struct(col("inner").as("schema")).as("data")))
    val boom = (b: org.apache.spark.sql.DataFrame) =>
      b.as[org.apache.spark.sql.Row](org.apache.spark.sql.Encoders.row(b.schema))
        .map { _ => throw new IllegalStateException("infrastructure failure") }(
          org.apache.spark.sql.Encoders.row(df.schema))
    val config = Router.Config("env/1", RegisteredSchema("env/1", Nil),
      Map("a/x/1" -> Router.Registration(RegisteredSchema("a/x/1", Nil), boom)))
    val routed = Router.route(df, config)
    val ex = intercept[Exception] { routed.branches("a/x/1").count() }
    assert(ex.getMessage.contains("infrastructure failure") ||
      ex.getCause != null, "handler failure must fail the job, not quarantine")
  }
}
