package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WordPiece induction invariants:
  *
  *  - the BERT `##`-marked initial segmentation and merge application equal
  *    a canonical driver-side greedy scan on the real corpus vocabulary;
  *  - training is a DIFFERENT selection than BPE on the same histogram (the
  *    likelihood-gain argmax must actually bite, not shadow raw frequency);
  *  - the fixed-point score matches the exact rational argmax computed
  *    driver-side with BigInt (no quantization reorder on the fixture);
  *  - every segmentation concatenates back to the original word with `##`
  *    markers exactly on non-initial pieces (the roundtrip-audit invariant,
  *    plus the marker-discipline half the audit row deliberately skips).
  */
class WordPieceSpec extends SparkSpec {

  private def greedy(syms: List[String], a: String, b: String): List[String] = {
    val merged = a + b.stripPrefix("##")
    def scan(s: List[String]): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += merged; i += 2 }
        else { out += s(i); i += 1 }
      }
      out.toList
    }
    var cur = syms
    var next = scan(cur)
    while (next != cur) { cur = next; next = scan(cur) }
    next
  }

  private def initList(w: String): List[String] =
    w.split("").toList match {
      case head :: tail => head :: tail.map("##" + _)
      case Nil          => Nil
    }

  private def hist = {
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("ct"))
  }

  test("trainMerges equals the canonical greedy scan on corpus vocabulary") {
    import spark.implicits._
    val (rules, segmented) = WordPiece.trainMerges(hist, rounds = 8)
    assert(rules.size === 8)
    val got = segmented.select(col("w"), col("sym")).as[(String, String)]
      .collect().toMap
    got.keys.toSeq.sorted.foreach { w =>
      val ref = rules.foldLeft(initList(w)) { (s, m) => greedy(s, m.lhs, m.rhs) }
      assert(got(w) === ref.mkString(" "), s"word '$w'")
    }
  }

  test("likelihood-gain argmax matches the exact BigInt rational argmax") {
    import spark.implicits._
    // replay training driver-side with EXACT rational comparison (cross-
    // multiplied BigInt, no fixed-point) and assert the same rules fall out
    // — i.e. the 10^18 quantization never reordered the fixture's argmax
    val words = hist.as[(String, Long)].collect().toList
    var segs: Map[String, List[String]] = words.map { case (w, _) => w -> initList(w) }.toMap
    val ct = words.toMap
    val (rules, _) = WordPiece.trainMerges(hist, rounds = 8)
    rules.foreach { rule =>
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      val symCounts = scala.collection.mutable.Map[String, Long]()
      segs.foreach { case (w, l) =>
        val c = ct(w)
        l.foreach(s => symCounts(s) = symCounts.getOrElse(s, 0L) + c)
        l.zip(l.tail).foreach(p => pairCounts(p) = pairCounts.getOrElse(p, 0L) + c)
      }
      // argmax by exact rational wt/(ca·cb): compare wt1·ca2·cb2 vs wt2·ca1·cb1
      val best = pairCounts.toSeq.map { case ((a, b), wt) =>
        (a, b, BigInt(wt), BigInt(symCounts(a)) * BigInt(symCounts(b)))
      }.reduceLeft { (x, y) =>
        val cmp = (x._3 * y._4).compare(y._3 * x._4)
        if (cmp > 0) x
        else if (cmp < 0) y
        else if (Ordering[(String, String)].lteq((x._1, x._2), (y._1, y._2))) x
        else y
      }
      assert((best._1, best._2) === ((rule.lhs, rule.rhs)),
        s"rank ${rule.rank}: exact argmax (${best._1}, ${best._2}) != trained")
      assert(best._3 === BigInt(rule.weight))
      // quantized score agrees with the exact one recomputed at 10^18
      assert(BigInt(rule.scoreFp) === best._3 * BigInt(10).pow(18) / best._4)
      segs = segs.map { case (w, l) => w -> greedy(l, rule.lhs, rule.rhs) }
    }
  }

  test("selection differs from BPE's raw-frequency argmax on this corpus") {
    val (wpRules, _) = WordPiece.trainMerges(hist, rounds = 8)
    val (bpeRules, _) = Bpe.trainMerges(hist, rounds = 8)
    // the families must not be the same trainer in disguise: at least one
    // round's chosen pair differs (stripped of ## markers for comparison)
    val wpPairs = wpRules.map(r => (r.lhs.stripPrefix("##"), r.rhs.stripPrefix("##")))
    val bpePairs = bpeRules.map(r => (r.lhs, r.rhs))
    assert(wpPairs !== bpePairs,
      "WordPiece chose BPE's exact merge sequence — the likelihood score never bit")
  }

  test("roundtrip + marker discipline: every piece list rebuilds its word") {
    import spark.implicits._
    val (_, segmented) = WordPiece.trainMerges(hist, rounds = 8)
    segmented.select(col("w"), col("sym")).as[(String, String)].collect()
      .foreach { case (w, sym) =>
        val pieces = sym.split(" ").toList
        assert(!pieces.head.startsWith("##"), s"initial piece marked: '$sym'")
        assert(pieces.tail.forall(_.startsWith("##")),
          s"non-initial piece unmarked: '$sym'")
        val rebuilt = pieces.head + pieces.tail.map(_.stripPrefix("##")).mkString
        assert(rebuilt === w, s"roundtrip failed: '$sym' -> '$rebuilt' != '$w'")
      }
  }

  test("greedySegment: longest-match-first, UNK on any miss, local-reference equality") {
    import spark.implicits._
    // handmade vocab exercising the paths the corpus fixture never hits
    // (it agrees 31/31 with merge replay): longest-match preference and
    // the BERT any-miss [UNK] rule
    val vocabDf = Seq("a", "##b", "##c", "##bc", "x").toDF("piece")
    val vm = WordPiece.vocabMapOf(vocabDf)
    val words = Seq("abc", "ab", "a", "axc", "zb", "abcbc").toDF("w")
    val got = words.crossJoin(broadcast(vm))
      .withColumn("g", WordPiece.greedySegment(col("w"), col("__vm")))
      .select(col("w"), col("g.pieces"), col("g.n_pieces"), col("g.unk"))
      .as[(String, String, Long, Boolean)].collect()
      .map { case (w, p, n, u) => w -> ((p, n, u)) }.toMap
    assert(got("abc") === (("a ##bc", 2L, false)),
      "greedy must take ##bc over ##b then ##c")
    assert(got("ab") === (("a ##b", 2L, false)))
    assert(got("a") === (("a", 1L, false)))
    // 'x' exists only UNMARKED: at a non-initial position '##x' misses → UNK
    assert(got("axc") === (("", 0L, true)))
    // initial 'z' not in vocab → UNK immediately
    assert(got("zb") === (("", 0L, true)))
    assert(got("abcbc") === (("a ##bc ##bc", 3L, false)))
    // driver-side reference on the same vocab agrees everywhere
    val vset = Set("a", "##b", "##c", "##bc", "x")
    def ref(w: String): (String, Long, Boolean) = {
      var pos = 0; val out = scala.collection.mutable.ListBuffer[String]()
      while (pos < w.length) {
        val pref = if (pos == 0) "" else "##"
        val k = (math.min(WordPiece.MaxGreedyPieceLen, w.length - pos) to 1 by -1)
          .find(k => vset.contains(pref + w.substring(pos, pos + k)))
        k match {
          case Some(kk) => out += pref + w.substring(pos, pos + kk); pos += kk
          case None => return ("", 0L, true)
        }
      }
      (out.mkString(" "), out.size.toLong, false)
    }
    got.keys.foreach(w => assert(got(w) === ref(w), s"word '$w'"))
  }

  test("vocabMapOf refuses pieces longer than MaxGreedyPieceLen loudly") {
    import spark.implicits._
    val bad = Seq("a", "##" + "b" * (WordPiece.MaxGreedyPieceLen + 1)).toDF("piece")
    val e = intercept[Exception] {
      WordPiece.vocabMapOf(bad).collect()
    }
    assert(e.getMessage.contains("longer than"))
  }

  test("vocabMapOf guard is marker-stripped: a raw-16 continuation is " +
    "accepted AND matchable by the walk") {
    import spark.implicits._
    // string length 18, raw length 16 == MaxGreedyPieceLen: the fixed arms
    // probe raw lengths, so this piece is perfectly matchable — a guard on
    // the STRING length would refuse it two characters early (r14 advice)
    val longCont = "##" + "b" * WordPiece.MaxGreedyPieceLen
    val vm = WordPiece.vocabMapOf(Seq("a", longCont).toDF("piece"))
    val got = Seq("a" + "b" * WordPiece.MaxGreedyPieceLen).toDF("w")
      .crossJoin(broadcast(vm))
      .withColumn("g", WordPiece.greedySegment(col("w"), col("__vm")))
      .select(col("g.pieces"), col("g.n_pieces"), col("g.unk"))
      .as[(String, Long, Boolean)].head()
    assert(got === (("a " + longCont, 2L, false)))
    // one char longer still refuses
    val bad = Seq("##" + "b" * (WordPiece.MaxGreedyPieceLen + 1)).toDF("piece")
    intercept[Exception] { WordPiece.vocabMapOf(bad).collect() }
  }

  test("initSym handles 1-char and 2-char words") {
    import spark.implicits._
    val df = Seq("a", "ab", "abc").toDF("w")
      .select(col("w"), WordPiece.initSym(col("w")).as("sym"))
    val got = df.as[(String, String)].collect().toMap
    assert(got("a") === "a")
    assert(got("ab") === "a ##b")
    assert(got("abc") === "a ##b ##c")
  }
}
