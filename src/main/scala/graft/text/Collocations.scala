package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Collocation extraction by pointwise mutual information — the classic
  * corpus-analysis operator (Church & Hanks 1990): bigrams whose observed
  * frequency beats the independence expectation p(x)·p(y) are multi-word
  * units ("New York", "machine learning"), the phrases a tokenizer budget
  * or a phrase-mining pass should treat as one symbol.
  *
  * Exactness: PMI's log is monotone, so ranking needs only the LIFT
  * p(x,y)/(p(x)p(y)) = c_xy·T_u² / (T_b·c_x·c_y), kept as an exact integer
  * permille (1000 = independence) via DECIMAL(38,0) products — inside 38
  * digits to T_u ≈ 3·10¹³ corpus tokens; the truncating division is
  * engine-identical.
  *
  * Scale: bigram assembly is row-local (split once, slice per ordinal);
  * unigram/bigram counts are wordcount-shaped aggs with map-side combine;
  * the unigram-count frame is vocabulary-sized and BROADCASTS onto the
  * bigram frame; totals ride a 1-row cross join; the final top-k is a
  * TakeOrdered. `minCount` applies the standard collocation support floor
  * so one-off co-occurrences never rank.
  */
object Collocations {

  /** Top-`topK` bigrams by exact-integer PMI lift:
    * (x, y, c_xy, c_x, c_y, lift_permille), ordered lift desc with
    * (c_xy desc, x, y) tie-breaks — deterministic in any engine.
    */
  def pmiTopPairs(docs: DataFrame, idCol: String, textCol: String,
                  minCount: Long = 5L, topK: Int = 20): DataFrame = {
    val words = docs.select(split(col(textCol), " ").as("__ws"))
    // both count frames land (Stages.materialize): uni feeds three
    // consumers (two broadcast sides + the total) and bi two — compact
    // vocabulary-sized outputs vs three re-tokenizations of the corpus
    val uni = graft.relational.Stages.materialize(
      words.select(explode(col("__ws")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c")),
      "pmi_uni")
    // UNFILTERED bigram counts land: T_b in the PMI denominator is the
    // total over ALL bigram occurrences (filtering first would inflate
    // every lift); the support floor applies only to which pairs RANK
    val bi = graft.relational.Stages.materialize(
      words.filter(size(col("__ws")) >= 2)
        .select(explode(transform(
          sequence(lit(1L), (size(col("__ws")) - lit(1)).cast("long"), lit(1L)),
          i => struct(element_at(col("__ws"), i.cast("int")).as("x"),
            element_at(col("__ws"), (i + lit(1)).cast("int")).as("y")))).as("b"))
        .groupBy(col("b.x").as("x"), col("b.y").as("y"))
        .agg(count(lit(1)).as("c_xy")),
      "pmi_bi")
    val totals = broadcast(uni.agg(
      sum(col("c")).cast(DecimalType(38, 0)).as("t_u"))
      .crossJoin(bi.agg(sum(col("c_xy")).as("t_b"))))
    bi
      .filter(col("c_xy") >= minCount)
      .join(broadcast(uni.select(col("t").as("x"), col("c").as("c_x"))), "x")
      .join(broadcast(uni.select(col("t").as("y"), col("c").as("c_y"))), "y")
      .crossJoin(totals)
      .withColumn("lift_permille",
        expr("(1000 * CAST(c_xy AS DECIMAL(38,0)) * t_u * t_u) div " +
          "(CAST(t_b AS DECIMAL(38,0)) * c_x * c_y)"))
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        col("lift_permille"))
      .orderBy(desc("lift_permille"), desc("c_xy"), col("x"), col("y"))
      .limit(topK)
  }
}
