package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the duplicate-URL collapse every crawl corpus
  * runs BEFORE content dedup: the same page arrives as `HTTPS://Host:443/a/`
  * and `https://host/a?utm_source=feed`, and treating the variants as
  * distinct documents double-counts the page in every per-domain cap,
  * dedup pass, and frequency statistic downstream.
  *
  * Normalization steps, all ROW-LOCAL regex/array expressions (rides the
  * scan; the only shuffle is the caller's ledger aggregation), each chosen
  * because both engines implement it with identical semantics:
  *   1. lowercase the scheme and authority (path/query case is preserved —
  *      paths are case-significant on most origins);
  *   2. drop the fragment (`#…` never reaches the server);
  *   3. drop default ports (`:443` for https, `:80` for http);
  *   4. drop trailing slashes on the path;
  *   5. drop tracking parameters (`utm_*`, `gclid`, `fbclid`) and SORT the
  *      surviving query parameters (param order is transport noise).
  *   `www.` is deliberately KEPT: host identity is the domain ledger's job
  *   ([[DomainCuration.registrableDomain]]), and stripping it here would
  *   alias hosts that can genuinely differ.
  */
object UrlCanonical {

  // (?i): real crawl data mixes case (UTM_SOURCE=x, Gclid=y); (=|$): a
  // VALUELESS tracking param is still tracking noise. Mirrored verbatim in
  // the DuckDB oracle — change in lockstep only. Parity claim is
  // ASCII-SCOPED: Java's (?i) folds ASCII only while RE2's applies Unicode
  // simple folding (U+017F 'ſ' folds to 's' in DuckDB but not here) —
  // tracking params in the wild are ASCII, and a Unicode-folded lookalike
  // surviving canonicalization is under-collapse, not corruption.
  private val trackingParam = "(?i)^(utm_[A-Za-z0-9_]*|gclid|fbclid)(=|$)"

  /** The canonical form of `url` (expects scheme://authority[/path][?q][#f];
    * non-URL strings come out mangled — gate inputs with
    * [[DomainCuration.host]] if the column is untrusted).
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_replace(regexp_extract(noFrag, "^([^?]*)", 1), "/+$", "")
    val query0 = regexp_extract(noFrag, "\\?(.*)$", 1)
    val auth2 = when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .otherwise(auth)
    val params = filter(split(query0, "&"),
      p => !p.rlike(trackingParam) && length(p) > 0)
    val q2 = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), auth2, path,
      when(length(q2) > 0, concat(lit("?"), q2)).otherwise(lit("")))
  }

  /** Per-`groupCol` canonicalization ledger: URLs seen, URLs the
    * normalization CHANGED, distinct canonical URLs, collapsed count
    * (variants beyond the first of each canonical), and the collapse
    * permille — the "how much of this feed is URL noise" reading.
    */
  def ledger(df: DataFrame, urlCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol), col(urlCol).as("__u"),
        canonicalUrl(col(urlCol)).as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_urls"),
        sum(when(col("__u") =!= col("__c"), 1L).otherwise(0L)).as("n_changed"),
        countDistinct(col("__c")).as("n_canonical"))
      .select(col(groupCol), col("n_urls"), col("n_changed"),
        col("n_canonical"),
        (col("n_urls") - col("n_canonical")).as("n_collapsed"),
        expr("(1000L * (n_urls - n_canonical)) div n_urls")
          .as("collapse_permille"))
}
