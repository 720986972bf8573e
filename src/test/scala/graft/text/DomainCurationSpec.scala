package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DomainCurationSpec extends SparkSpec {
  import spark.implicits._

  test("host extraction handles port, path, query, fragment, non-URLs") {
    val rows = Seq(
      "https://www.a.com/x/y",
      "http://b.org:8080/z",
      "https://c.net?q=1",
      "ftp://d.io#frag",
      "not a url at all",
      "https://plain.com").toDF("url")
      .select(DomainCuration.host(col("url"))).as[String].collect()
    assert(rows === Seq("www.a.com", "b.org", "c.net", "d.io", "", "plain.com"))
  }

  test("registrable domain is the last-two-labels roll-up") {
    val rows = Seq("www.a.com", "x.y.b.org", "c.net", "localhost")
      .toDF("h").select(DomainCuration.registrableDomain(col("h")))
      .as[String].collect()
    assert(rows === Seq("a.com", "b.org", "c.net", "localhost"))
  }

  test("ledger caps per domain, blocks domains, and counts dups") {
    val docs = Seq(
      (1L, "https://www.a.com/1", "t one"),
      (2L, "https://cdn.a.com/2", "t one"),   // exact dup text of 1
      (3L, "https://a.com/3", "t three"),     // over cap=2 for a.com
      (4L, "https://bad.com/4", "t four"),    // blocked
      (5L, "https://b.org/5", "t five"))
      .toDF("doc_id", "url", "text")
    val led = DomainCuration.ledger(docs, "doc_id", "url", "text",
      tokens = size(split(col("text"), " ")),
      maxDocsPerDomain = 2L, blocklist = Seq("bad.com"))
      .orderBy(col("domain"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    val byDom = led.map(r => r._1 -> r).toMap
    // a.com: 3 docs, keep 2 lowest ids, cap 1; 2 unique texts of 3
    assert(byDom("a.com") ===
      (("a.com", 3L, 0L, 2L, 1L, 6L, 4L, 666L, 333L)))
    // bad.com: blocked entirely
    assert(byDom("bad.com") ===
      (("bad.com", 1L, 1L, 0L, 0L, 2L, 0L, 0L, 0L)))
    // b.org: untouched
    assert(byDom("b.org") ===
      (("b.org", 1L, 0L, 1L, 0L, 2L, 2L, 1000L, 0L)))
  }

  test("grouped split puts every domain in exactly one split, ~8/1/1") {
    val docs = (1L to 900L)
      .map(i => (i, s"d${i % 300}.com")).toDF("doc_id", "domain")
    val sp = DomainCuration.groupedSplit(docs, "domain")
    val leaky = sp.select("domain", "split").distinct()
      .groupBy("domain").count().filter(col("count") > 1).count()
    assert(leaky === 0L, "a domain appeared in more than one split")
    val byName = sp.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byName.keySet === Set("train", "val", "test"))
    // md5 mod 10 over 300 domains: train ≈ 80% — loose band, deterministic
    assert(byName("train") > 600L && byName("train") < 800L,
      s"train share off: $byName")
  }

  test("domain-cardinality contract refuses loudly") {
    val docs = (1L to 10L)
      .map(i => (i, s"https://host$i.com/x", "t")).toDF("doc_id", "url", "text")
    val e = intercept[IllegalArgumentException] {
      DomainCuration.ledger(docs, "doc_id", "url", "text",
        tokens = lit(1L), maxDocsPerDomain = 5L, blocklist = Nil,
        maxDomains = 4)
    }
    assert(e.getMessage.contains("distinct domains"))
  }
}
