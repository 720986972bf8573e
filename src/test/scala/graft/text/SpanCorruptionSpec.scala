package graft.text

import graft.SparkSpec

class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Sequential reference: same md5-prefix start rule, naive span union. */
  private def seqPlan(docId: Long, text: String, spanLen: Int, rate: Int)
      : (Long, Long, Long, Long) = {
    val n = text.split(" ", -1).length
    val starts = (0 until n).filter { p =>
      java.lang.Long.parseLong(md5hex(s"$docId:$p").substring(0, 15), 16) % rate == 0
    }
    val masked = Array.fill(n)(false)
    starts.foreach(p => (p until math.min(p + spanLen, n)).foreach(masked(_) = true))
    // spans = OVERLAP-merged start groups (T5 sentinel semantics: adjacent
    // but non-overlapping spans keep distinct sentinels), i.e. a new span
    // whenever the gap from the previous start exceeds spanLen − 1
    val nSpans = starts.zipWithIndex.count { case (p, i) =>
      i == 0 || p - starts(i - 1) > spanLen - 1
    }
    (n.toLong, starts.size.toLong, nSpans.toLong, masked.count(identity).toLong)
  }

  test("plan matches the sequential union simulation on fixture docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val got = SpanCorruption.plan(docs.toSeq.toDF("doc_id", "text"),
      "doc_id", "text", spanLen = 3, rate = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    docs.foreach { case (id, text) =>
      val (n, st, sp, mk) = seqPlan(id, text, 3, 10)
      assert(got(id) === ((n, st, sp, mk)), s"doc $id diverged")
    }
  }

  test("degenerate cases: no starts, and a start at the last token truncates") {
    // rate=1 → every position starts a span → whole doc masked, one island
    val d = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    val all = SpanCorruption.plan(d, "doc_id", "text", spanLen = 3, rate = 1)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(all === ((7L, 5L, 5L, 1L, 5L, 1000L)))
  }
}
