package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the jusText-class block classifier: first-pass classes from link
  * density (cross-multiplied integers) + length, one-step smoothing that
  * rescues short blocks ONLY beside first-pass-good neighbors, and the
  * per-source ledger arithmetic. Link flags come from the md5-mod-5 stub;
  * these tests pick words whose flag is KNOWN (asserted in-test, so a stub
  * change fails loudly here rather than hash-failing at the gate).
  */
class MainContentSpec extends SparkSpec {
  import spark.implicits._

  /** True when the stub classifies `w` as anchor text. */
  private def isLink(w: String): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 5 == 0
  }

  // verified constants for the vocabulary used below
  private val linkWord = "join"   // md5 mod 5 == 0
  private val bodyWord = "query"  // md5 mod 5 == 4

  test("stub link flags of the test vocabulary are what the tests assume") {
    assert(isLink(linkWord), s"'$linkWord' must hash to a link word")
    assert(!isLink(bodyWord), s"'$bodyWord' must hash to a body word")
  }

  private def ledgerOf(text: String) =
    MainContent.ledger(
      Seq((1L, text, "s1")).toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", blockWords = 4, minGoodWords = 3)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head

  test("good blocks keep, link-dense blocks drop") {
    val body = Array.fill(4)(bodyWord).mkString(" ")   // 0/4 links -> good
    val nav = Array.fill(4)(linkWord).mkString(" ")    // 4/4 links -> bad
    val (_, nDocs, nBlocks, kept, tokTotal, tokKept, kbp, ktp) =
      ledgerOf(s"$body $nav")
    assert((nDocs, nBlocks, kept) === ((1L, 2L, 1L)))
    assert((tokTotal, tokKept) === ((8L, 4L)))
    assert((kbp, ktp) === ((500L, 500L)))
  }

  test("short block is rescued beside a good block, dropped inside chrome") {
    // doc A: good(4 body) + short tail(1 body) -> tail rescued
    val a = ledgerOf(Array.fill(5)(bodyWord).mkString(" "))
    assert((a._3, a._4, a._6) === ((2L, 2L, 5L)), "tail rescued beside good")
    // doc B: bad(4 links) + short tail(1 body) -> tail NOT rescued
    val b = ledgerOf((Array.fill(4)(linkWord) :+ bodyWord).mkString(" "))
    assert((b._3, b._4, b._6) === ((2L, 0L, 0L)), "tail dropped inside chrome")
  }

  test("smoothing reads FIRST-PASS classes, not smoothed ones") {
    // good(4 body) + short(1 link word padded? no: mixed short) + short:
    // block2 = [body] short (rescued by block1), block3 would only be
    // rescued if block2's SMOOTHED class counted — it must stay dropped.
    // blocks of 4: [b b b b] [b] — only 2 blocks; build 3 blocks instead:
    // [b b b b] [l l b b] [b] : block2 has 2/4 links -> bad (2*2 >= 4);
    // block3 short beside bad+end -> dropped.
    val words = Array.fill(4)(bodyWord) ++
      Array(linkWord, linkWord, bodyWord, bodyWord) :+ bodyWord
    val r = ledgerOf(words.mkString(" "))
    assert((r._3, r._4) === ((3L, 1L)),
      "only the leading good block survives")
  }

  test("mid-document short between two good blocks is rescued once") {
    // 4 good + 4 good + trailing 2-word short: blocks [g][g][short]
    val words = Array.fill(8)(bodyWord) ++ Array(bodyWord, bodyWord)
    val r = ledgerOf(words.mkString(" "))
    assert((r._3, r._4, r._6) === ((3L, 3L, 10L)))
  }
}
