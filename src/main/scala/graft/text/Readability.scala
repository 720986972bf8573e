package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FORCAST readability profile — the readability member of the quality
  * family, chosen over Flesch–Kincaid DELIBERATELY: FK needs sentence
  * boundaries, and both this fixture and much of a real training corpus
  * (listings, logs, code comments, tag soups) have none — counting
  * sentences there is gate theater. FORCAST (Caylor et al. 1973, built
  * for technical material) uses only word-level structure:
  *   grade = 20 − N/10,  N = monosyllabic words per 150-word sample,
  * in milli-grades as one truncating div: 20000 − (15000·mono) div words.
  *
  * Syllables are the standard vowel-group heuristic ([aeiouy]+ runs,
  * lowercased) — counted with pure length arithmetic on regexp_replace
  * output (groups = len(each-group→"V") − len(groups-removed)), identical
  * RE2/Java semantics for this class-only pattern; monosyllabic = exactly
  * one group. Everything is row-local string math (no explode, no
  * shuffle before the per-group sum) and integer-exact.
  */
object Readability {

  private def groups(c: Column): Column =
    length(regexp_replace(c, "[aeiouy]+", "V")) -
      length(regexp_replace(c, "[aeiouy]+", ""))

  /** Per-doc columns appended: n_words, n_syllables, n_mono. */
  def perDoc(docs: DataFrame, textCol: String): DataFrame = {
    val lower_ = lower(col(textCol))
    docs
      .withColumn("n_words", size(split(col(textCol), " ")).cast("long"))
      // vowel groups never span a space (space is not in the class), so
      // the whole-text count IS the per-word sum
      .withColumn("n_syllables", groups(lower_).cast("long"))
      .withColumn("n_mono", size(filter(split(lower_, " "),
        w => groups(w) === 1)).cast("long"))
  }

  /** Per-group profile: n_docs, n_words, syllables_per_100w,
    * mono_permille, forcast_grade_milli (corpus-level ratios — exact,
    * not averages of per-doc truncations).
    */
  def profile(docs: DataFrame, textCol: String,
              groupCols: Seq[String]): DataFrame =
    perDoc(docs, textCol)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_syllables")).as("__syl"),
        sum(col("n_mono")).as("__mono"))
      .select(groupCols.map(col) ++ Seq(
        col("n_docs"), col("n_words"),
        expr("(100L * __syl) div n_words").as("syllables_per_100w"),
        expr("(1000L * __mono) div n_words").as("mono_permille"),
        expr("20000L - (15000L * __mono) div n_words")
          .as("forcast_grade_milli")): _*)
}
