package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  test("checksum is order-insensitive and change-sensitive") {
    val a = Seq((1L, "x", "s1"), (2L, "y", "s1"), (3L, "z", "s2"))
      .toDF("id", "v", "src")
    val shuffled = Seq((3L, "z", "s2"), (2L, "y", "s1"), (1L, "x", "s1"))
      .toDF("id", "v", "src")
    val mutated = Seq((1L, "x", "s1"), (2L, "Y", "s1"), (3L, "z", "s2"))
      .toDF("id", "v", "src")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Checksum.perGroup(df, "src", Seq("id", "v"))
        .as[(String, Long, String)].collect().toSeq
    assert(sums(a) === sums(shuffled))
    val (orig, mut) = (sums(a), sums(mutated))
    assert(orig.head._3 !== mut.head._3)      // s1 sum moved
    assert(orig(1) === mut(1))                // s2 untouched
  }

  test("duplicate rows change the sum (multiplicity is part of the digest)") {
    val once = Seq((1L, "x", "s")).toDF("id", "v", "src")
    val twice = Seq((1L, "x", "s"), (1L, "x", "s")).toDF("id", "v", "src")
    val o = Checksum.perGroup(once, "src", Seq("id", "v"))
      .as[(String, Long, String)].collect().head
    val t = Checksum.perGroup(twice, "src", Seq("id", "v"))
      .as[(String, Long, String)].collect().head
    assert(t._2 === 2L && o._2 === 1L)
    assert(BigInt(t._3) === BigInt(o._3) * 2)
  }

  test("a field containing the separator fails loudly") {
    val bad = Seq((1L, "ab", "s")).toDF("id", "v", "src")
    val e = intercept[Exception](
      Checksum.perGroup(bad, "src", Seq("id", "v")).collect())
    assert(e.getMessage.contains("separator") ||
      Option(e.getCause).exists(_.getMessage.contains("separator")))
  }
}
