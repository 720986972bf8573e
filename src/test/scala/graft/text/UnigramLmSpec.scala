package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def wh = Seq(
    ("abab", 5L), ("aba", 3L), ("cab", 2L), ("dddd", 1L), ("x", 4L))
    .toDF("w", "ct")

  test("lattice bits equal the brute-force optimum on every word") {
    val vocab = UnigramLm.seedVocab(wh)
    val costs = vocab.select("piece", "bits").as[(String, Long)]
      .collect().toMap
    val seg = wh.crossJoin(broadcast(UnigramLm.costMapOf(vocab)))
      .withColumn("acc", UnigramLm.dpAcc(col("w"), col("__m")))
      .select(col("w"),
        shiftright(element_at(col("acc"), length(col("w")) + 1), 10).as("bits"),
        UnigramLm.btPieces(col("w"), col("acc")).as("ps"))
      .as[(String, Long, Seq[String])].collect()
    def brute(w: String): Long =
      if (w.isEmpty) 0L
      else (1 to math.min(UnigramLm.MaxPieceLen, w.length)).map { k =>
        costs.getOrElse(w.take(k), UnigramLm.MissingCost) + brute(w.drop(k))
      }.min
    seg.foreach { case (w, bits, ps) =>
      assert(bits === brute(w), s"word $w")
      // the backtrack walk emits right-to-left; the reversed concat must
      // reconstruct the word exactly
      assert(ps.reverse.mkString === w, s"word $w pieces $ps")
    }
  }

  test("training keeps every char, prunes unused multis, usage conserves") {
    val vocab = UnigramLm.trainVocab(wh).collect()
    val pieces = vocab.map(_.getString(0)).toSet
    val corpusChars = Set("a", "b", "c", "d", "x")
    assert(corpusChars.subsetOf(pieces), "single chars always survive")
    val seedCount = UnigramLm.seedVocab(wh).count()
    assert(vocab.length < seedCount, "EM pruning must fire")
    // every kept multi-char piece was actually used in the last E-step
    vocab.foreach { r =>
      if (r.getString(0).length > 1)
        assert(r.getLong(1) > 0L, s"unused multi piece ${r.getString(0)} kept")
    }
  }

  test("pieceCounts round-trips word length bounds (1 <= n_uni <= len)") {
    val vocab = UnigramLm.trainVocab(wh)
    val pc = UnigramLm.pieceCounts(wh, vocab)
      .as[(String, Long)].collect().toMap
    assert(pc.keySet === Set("abab", "aba", "cab", "dddd", "x"))
    pc.foreach { case (w, n) =>
      assert(n >= 1L && n <= w.length.toLong, s"$w -> $n")
    }
    assert(pc("x") === 1L)
  }

  test("a smaller seed budget yields fewer pieces and strictly higher fertility") {
    def fertility(multiK: Int): (Long, Long) = {
      val vocab = UnigramLm.trainVocab(wh, multiK)
      val tok = UnigramLm.pieceCounts(wh, vocab).join(wh, Seq("w"))
        .agg(sum(col("ct") * col("n_uni"))).as[Long].collect().head
      (vocab.count(), tok)
    }
    val (nChars, charTok) = fertility(0)   // chars only — the ceiling
    val (nFull, fullTok) = fertility(8)
    assert(nChars < nFull, "zero multi budget keeps only chars")
    assert(charTok > fullTok,
      "char-only segmentation must use strictly more pieces")
    // chars-only fertility equals total characters exactly
    val chars = wh.select(sum(col("ct") * length(col("w")))).as[Long]
      .collect().head
    assert(charTok === chars)
  }

  test("tokens past MaxWordLen or empty refuse loudly inside the DP column") {
    val vocab = UnigramLm.seedVocab(wh)
    val long = Seq(("a" * (UnigramLm.MaxWordLen + 1), 1L)).toDF("w", "ct")
    val e = intercept[Exception] {
      UnigramLm.pieceCounts(long, vocab).collect()
    }
    assert(e.getMessage.contains("5-bit lattice"))
    // empty token: sequence(1, 0) counts DOWN in Spark — must refuse, not
    // silently corrupt the lattice
    val empty = Seq(("", 1L)).toDF("w", "ct")
    val e2 = intercept[Exception] {
      UnigramLm.pieceCounts(empty, vocab).collect()
    }
    assert(e2.getMessage.contains("empty tokens corrupt"))
  }
}
