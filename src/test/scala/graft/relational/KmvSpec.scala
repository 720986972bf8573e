package graft.relational

import graft.SparkSpec

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("below k distinct the sketch reports exactly") {
    val df = (1 to 100).map(i => ("a", (i % 10).toString)).toDF("g", "id")
    val out = Kmv.distinctAudit(df, "g", "id", k = 16)
      .select("exact_distinct", "kmv_estimate", "err_permille")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((10L, 10L, 0L)))
  }

  test("the estimate matches the closed form on a pinned hash set") {
    // ids 0..4999: k-th min and (k−1)·2⁶⁰ div h₍ₖ₎ replicated offline
    val df = (0 until 5000).map(i => ("a", i.toString)).toDF("g", "id")
    val out = Kmv.distinctAudit(df, "g", "id", k = 64)
      .select("exact_distinct", "kth_min", "kmv_estimate", "err_permille")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((5000L, 13764088718018884L, 5277L, 55L)))
  }

  test("misuse fails loudly: k out of range") {
    val df = Seq(("a", "1")).toDF("g", "id")
    intercept[IllegalArgumentException](Kmv.distinctAudit(df, "g", "id", k = 8))
  }

  test("shard merge is exact: merged sketch == direct sketch, any shard split") {
    val df = (0 until 5000).map(i => ("a", i.toString)).toDF("g", "id")
    for (shards <- Seq(2, 4, 16)) {
      val out = Kmv.mergeAudit(df, "g", "id", k = 64, shards = shards)
        .select("kth_direct", "kth_merged", "merge_exact", "kmv_estimate")
        .as[(Long, Long, Boolean, Long)].collect().toSeq
      // same pinned hash set as the closed-form test above
      assert(out === Seq((13764088718018884L, 13764088718018884L, true, 5277L)))
    }
  }

  test("shard merge on a tiny group stays exact below k") {
    val df = (0 until 10).map(i => ("a", i.toString)).toDF("g", "id")
    val out = Kmv.mergeAudit(df, "g", "id", k = 64, shards = 4)
      .select("m_direct", "merge_exact", "kmv_estimate")
      .as[(Long, Boolean, Long)].collect().toSeq
    assert(out === Seq((10L, true, 10L)))
  }
}
