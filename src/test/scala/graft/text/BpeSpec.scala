package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE induction invariants:
  *
  *  - the string-replace merge application ([[Bpe.applyRule]], also the
  *    DuckDB oracle's primitive) equals the canonical greedy left-to-right
  *    merge scan, on the real corpus vocabulary AND on adversarial
  *    overlapping-run words the replace representation is known to stress;
  *  - [[Bpe.Passes]] replace passes reach fixpoint (a further pass is a
  *    no-op) on everything the trained rules ever touch;
  *  - training is deterministic and the learned weights are consistent.
  */
class BpeSpec extends SparkSpec {

  /** Canonical BPE apply: one greedy left-to-right scan, merging every
    * non-overlapping (a, b) adjacency, repeated to fixpoint (a scan can
    * expose no NEW adjacency for the same rule — merged tokens differ from
    * both a and b unless a == b == ab, impossible — so one scan suffices;
    * the loop is belt-and-braces).
    */
  private def greedy(syms: List[String], a: String, b: String): List[String] = {
    def scan(s: List[String]): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
        else { out += s(i); i += 1 }
      }
      out.toList
    }
    var cur = syms
    var next = scan(cur)
    while (next != cur) { cur = next; next = scan(cur) }
    next
  }

  private def corpusWords: Seq[String] = {
    import spark.implicits._
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSeq.sorted
  }

  test("applyRule equals the canonical greedy merge on corpus vocabulary") {
    import spark.implicits._
    val words = corpusWords
    val (rules, segmented) = Bpe.trainMerges(
      spark.read.parquet(s"$sf0001/documents.parquet")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("ct")), rounds = 8)
    assert(rules.size === 8)
    val got = segmented.select(col("w"), col("sym")).as[(String, String)]
      .collect().toMap
    words.foreach { w =>
      val ref = rules.foldLeft(w.split("").toList) { (s, m) => greedy(s, m.lhs, m.rhs) }
      assert(got(w) === ref.mkString(" "), s"word '$w'")
    }
  }

  test("replace passes reach fixpoint: pass Passes+1 is a no-op") {
    import spark.implicits._
    val hist = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("ct"))
    val (rules, segmented) = Bpe.trainMerges(hist, rounds = 8)
    // re-apply every rule one extra pass over the final segmentation
    val extra = rules.foldLeft(col("sym")) { (c, m) =>
      trim(replace(concat(lit(" "), c, lit(" ")),
        lit(s" ${m.lhs} ${m.rhs} "), lit(s" ${m.lhs}${m.rhs} ")))
    }
    val changed = segmented.withColumn("extra", extra)
      .filter(col("extra") =!= col("sym")).count()
    assert(changed === 0L)
  }

  test("adversarial same-pair runs: unextendable matching, rejoin identity, greedy equality under run-5") {
    import spark.implicits._
    // runs where one replace pass provably misses occurrences; same-pair
    // runs ≥5 legitimately differ from the canonical scan in positions, and
    // ≥8 in count (documented in Bpe's scaladoc) — but the result must
    // always be an unextendable matching that preserves the symbol stream
    val cases = Seq(
      "a a", "a a a", "a a a a", "a a a a a", "a a a a a a a a",
      "a b a b", "a b a b a b", "b a b a b", "x a a a a y")
    val df = cases.toDF("sym")
    for ((lhs, rhs) <- Seq(("a", "a"), ("a", "b"))) {
      val rows = df.select(col("sym"), Bpe.applyRule(col("sym"), lhs, rhs).as("r")).collect()
      rows.foreach { row =>
        val in = row.getString(0).split(" ").toList
        val got = row.getString(1).split(" ").toList
        val ref = greedy(in, lhs, rhs)
        // rejoining reproduces the input symbol stream exactly
        assert(got.mkString === in.mkString, s"rule ($lhs,$rhs) on '${row.getString(0)}'")
        // no mergeable adjacency survives (the matching is unextendable)
        assert(!got.zip(got.drop(1)).contains((lhs, rhs)),
          s"rule ($lhs,$rhs) left an unmerged pair in '${row.getString(1)}'")
        // below the run-5 threshold the result is exactly canonical
        if (!row.getString(0).contains("a a a a a"))
          assert(row.getString(1) === ref.mkString(" "),
            s"rule ($lhs,$rhs) on '${row.getString(0)}'")
      }
    }
  }

  test("training is deterministic and weights are positive and sane") {
    val hist = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("ct"))
    val (r1, _) = Bpe.trainMerges(hist, rounds = 4)
    val (r2, _) = Bpe.trainMerges(hist, rounds = 4)
    assert(r1 === r2)
    assert(r1.forall(_.weight > 0))
    // each rule merges a pair that existed under the previous segmentation,
    // so later rounds can never report a HIGHER weight than an earlier round
    // would have chosen over the same pair space at round 1... weights are
    // non-increasing only per-pair, not globally; just assert ranks are 1..n
    assert(r1.map(_.rank) === (1 to 4))
  }
}
