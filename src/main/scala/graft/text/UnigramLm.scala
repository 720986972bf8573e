package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword vocabulary induction (Kudo 2018, "Subword
  * Regularization"; the SentencePiece `unigram` trainer) — the OTHER
  * production tokenizer family beside BPE: seed a large candidate piece
  * inventory, alternate Viterbi segmentation (E) with piece re-scoring and
  * pruning (M), keep the pieces the corpus actually uses.
  *
  * Engine-portable discipline (the repo's libm-free surprisal rules):
  *  - piece costs are INTEGER BITS — `length(bin(total div count)) − 1` —
  *    so no log ever executes in either engine;
  *  - the Viterbi lattice value is ONE int64 per position,
  *    `enc = bits<<10 | n_pieces<<5 | back_pointer` (fields bounded by the
  *    loud [[MaxWordLen]] refusal), so "min cost, then fewest pieces, then
  *    smallest back pointer" is plain integer `min` in both engines and the
  *    chosen segmentation is bit-identical cross-engine;
  *  - hard-EM (Viterbi counts, the standard simplification of Kudo's
  *    expected counts) with a FIXED round count, so the DuckDB oracle
  *    replays training exactly as chained recursive CTEs.
  *
  * Scale shape: the corpus collapses once to the (w, ct) word-type
  * histogram (the BPE precedent — map-side combined, MBs at 100 TB); every
  * training stage after that is vocabulary-sized. The DP runs as row-local
  * array expressions over the histogram with the piece-cost MAP folded in
  * by a one-row broadcast (`map_from_entries` aggregate — no driver
  * collect, no literal interpolation), and applying the tokenizer back to
  * the corpus is a broadcast (w → n_pieces) equi-join, shuffle-free on the
  * corpus side.
  */
object UnigramLm {

  /** Longest candidate piece (chars). */
  val MaxPieceLen = 4
  /** Multi-char seed pieces kept (by count desc, piece asc); single chars
    * are ALWAYS kept for coverage. Sized so EM pruning fires on the
    * sf0.01 gate fixture, not only at bench scale.
    */
  val SeedMultiK = 48
  /** Hard-EM rounds (segment → recount → rescore → prune). */
  val EmRounds = 2
  /** Longest segmentable token: the 5-bit piece-count and back-pointer
    * fields of the lattice encoding hold values ≤ 31. Refused loudly
    * inside the DP column (pruning-proof); a real corpus pre-splits such
    * tokens upstream.
    */
  val MaxWordLen = 30
  /** Cost of a piece absent from the vocabulary — never on a chosen path
    * (single chars are always present) but keeps the lattice total.
    */
  val MissingCost = 1048576L

  /** Candidate pieces: every substring of length 1..[[MaxPieceLen]] of
    * every word type, weighted by word count per occurrence position.
    */
  def seedPieces(wh: DataFrame): DataFrame =
    wh.select(col("ct"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        i => transform(
          sequence(lit(1), least(lit(MaxPieceLen), length(col("w")) - i + 1)),
          k => col("w").substr(i, k))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("ct")).as("cnt"))

  /** Seed vocabulary: all single chars + top-`multiK` multi-char
    * candidates, scored in integer bits against the kept total.
    * Output: (piece, usage, bits).
    */
  def seedVocab(wh: DataFrame, multiK: Int = SeedMultiK): DataFrame = {
    val sp = seedPieces(wh)
    val chars = sp.filter(length(col("piece")) === 1)
    // top-K via orderBy+limit = distributed TakeOrdered, never a global
    // window — the candidate space is huge at corpus scale
    val multi = sp.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(multiK)
    val v0 = chars.unionByName(multi)
    val t0 = v0.agg(sum(col("cnt")).as("T"))
    v0.crossJoin(broadcast(t0))
      .select(col("piece"), col("cnt").as("usage"),
        (length(bin(expr("T div cnt"))) - 1).cast("long").as("bits"))
  }

  /** One-row (piece → bits) map frame, built IN-PLAN (no driver collect). */
  def costMapOf(vocab: DataFrame): DataFrame =
    vocab.agg(map_from_entries(
      collect_list(struct(col("piece"), col("bits")))).as("__m"))

  /** Viterbi lattice over `w` under cost map `m`: array of int64
    * `enc = bits<<10 | n_pieces<<5 | back_pointer` per prefix length,
    * index 1 = empty prefix. Deterministic: ties break toward fewer
    * pieces, then the smallest back pointer — plain integer min.
    */
  def dpAcc(w: Column, m: Column): Column = {
    // the empty-token refusal is load-bearing, not pedantry: length 0 makes
    // sequence(1, 0) count DOWN in Spark (the Bpe.scala sequence() lesson)
    // and the lattice would silently corrupt; a tokenizer upstream that
    // emits "" (double spaces) must be fixed, not absorbed
    val guarded = when(length(w) > MaxWordLen || length(w) === 0,
      raise_error(concat(
        lit(s"unigramLm: token length outside [1, $MaxWordLen] ('"), w,
        lit("') — empty tokens corrupt the lattice and longer ones " +
          "overflow the 5-bit lattice fields; pre-split the corpus " +
          "or raise MaxWordLen")))).otherwise(w)
    aggregate(
      sequence(lit(1), length(guarded)),
      array(lit(0L)),
      (acc, i) => concat(acc, array(
        array_min(transform(
          sequence(greatest(lit(1), i - lit(MaxPieceLen - 1)), i),
          jj => {
            val prev = element_at(acc, jj)
            val cost = coalesce(
              element_at(m, guarded.substr(jj, i - jj + 1)),
              lit(MissingCost))
            shiftleft(shiftright(prev, 10) + cost, 10) +
              shiftleft(shiftright(prev, 5).bitwiseAND(lit(31L)) + 1L, 5) +
              (jj - 1).cast("long")
          })))))
  }

  /** Chosen pieces of the lattice `acc` for word `w`, by back-pointer walk
    * (emitted right-to-left; usage counting is order-free).
    */
  def btPieces(w: Column, acc: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(length(w).cast("long").as("pos"),
        array().cast("array<string>").as("ps")),
      (st, _) => {
        val pos = st.getField("pos")
        val enc = element_at(acc, (pos + 1L).cast("int"))
        val j = enc.bitwiseAND(lit(31L))
        val piece = w.substr((j + 1L).cast("int"), (pos - j).cast("int"))
        when(pos > 0L,
          struct(j.as("pos"),
            concat(st.getField("ps"), array(piece)).as("ps")))
          .otherwise(st)
      },
      st => st.getField("ps"))

  /** One hard-EM round: Viterbi-segment the histogram under `vocab`,
    * recount usage, rescore `bits = len(bin(U div (usage+1))) − 1`, prune
    * multi-char pieces the corpus stopped using (chars always survive).
    */
  def emRound(wh: DataFrame, vocab: DataFrame): DataFrame = {
    val seg = wh.crossJoin(broadcast(costMapOf(vocab)))
      .withColumn("__acc", dpAcc(col("w"), col("__m")))
      .select(col("ct"), explode(btPieces(col("w"), col("__acc"))).as("piece"))
    val usage = seg.groupBy(col("piece")).agg(sum(col("ct")).as("__u"))
    val tot = usage.agg(sum(col("__u")).as("U"))
    vocab.select(col("piece")).join(usage, Seq("piece"), "left")
      .crossJoin(broadcast(tot))
      .select(col("piece"), coalesce(col("__u"), lit(0L)).as("usage"), col("U"))
      .filter(length(col("piece")) === 1 || col("usage") > 0)
      .select(col("piece"), col("usage"),
        (length(bin(expr("U div (usage + 1)"))) - 1).cast("long").as("bits"))
  }

  /** Full training: seed → [[EmRounds]] hard-EM rounds.
    * Output: (piece, usage, bits), the final kept vocabulary.
    */
  def trainVocab(wh: DataFrame, multiK: Int = SeedMultiK): DataFrame =
    (1 to EmRounds).foldLeft(seedVocab(wh, multiK))((v, _) => emRound(wh, v))

  /** (w, n_uni): pieces per word type under `vocab` — the broadcast apply
    * table for fertility readings (the BPE `n_sub` twin).
    */
  def pieceCounts(wh: DataFrame, vocab: DataFrame): DataFrame =
    wh.crossJoin(broadcast(costMapOf(vocab)))
      .withColumn("__acc", dpAcc(col("w"), col("__m")))
      .select(col("w"),
        shiftright(element_at(col("__acc"), length(col("w")) + 1), 5)
          .bitwiseAND(lit(31L)).as("n_uni"))
}
