package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.TextExprs

import graft.functions.{TextFunctions => T}

/** URL/host-level web curation — the CCNet/RefinedWeb front half: a
  * web-scale pipeline dedupes and filters by canonical URL and domain
  * BEFORE any content pass, because the URL key costs one codegen'd
  * string expression per row while every content key costs a tokenize.
  *
  * The canonicalization rules live in
  * [[org.apache.spark.sql.graftvec.TextExprs.canonicalizeUrl]] (one
  * codegen expression, SQL-registered as `url_canonicalize`); this object
  * holds the relational stages over the canonical key.
  */
object WebCuration {

  /** Canonical URL key (codegen; see TextExprs.canonicalizeUrl rules). */
  def canonicalUrl(url: Column): Column = TextExprs.canonicalizeUrlCol(url)

  /** The host/registered-domain of an already-canonical URL (the
    * canonicalizer has lowercased the authority and stripped `www.` and
    * default ports, so this is one anchored regex).
    */
  def domainOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z0-9+.-]+://([^/?:]+)", 1)

  /** URL-KEYED EXACT DEDUP — step one of the web recipe: group on the
    * canonical URL, keep the smallest id as the representative. Emits one
    * row per distinct canonical URL: `(canon_url, keep_id, n_variants)`.
    *
    * Scale shape: one map-only codegen canonicalization + ONE hash
    * aggregation on the canonical key (map-side combine collapses
    * variant bursts before the exchange) — the cheapest dedup pass in
    * the ladder, which is exactly why the recipe runs it before any
    * shingle/MinHash content pass.
    */
  def urlKeyDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(canonicalUrl(col(urlCol)).as("canon_url"),
        col(idCol).cast("bigint").as("id"))
      .groupBy(col("canon_url"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_variants"))

  /** PER-DOMAIN AGGREGATION — the curation ledger a web pipeline keeps
    * per registered domain: document count, total whitespace tokens, and
    * mean document length in exact micro chars
    * (`(10⁶·Σchars) DIV n_docs`, truncating — engine-portable).
    *
    * Scale shape: map-only canonicalize + domain extract, then ONE hash
    * aggregation keyed by domain — bounded by domain cardinality
    * (~10⁸ registered domains on the full web), never by document count.
    */
  def domainStats(
      df: DataFrame, urlCol: String, textCol: String,
      charsCol: String): DataFrame =
    df.select(domainOf(canonicalUrl(col(urlCol))).as("domain"),
        size(T.tokens(col(textCol))).cast("bigint").as("n_toks"),
        col(charsCol).cast("bigint").as("n_chars"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sum(n_chars))" +
          " DIV count(1) AS BIGINT)").as("mean_chars_micro"))

  /** Blocklist flag join: left-join a (tiny, curated) domain blocklist
    * onto per-domain stats — `blocked` 1/0. The blocklist side is
    * list-sized by construction (human/md5-curated), so it broadcasts.
    */
  def withBlocklist(stats: DataFrame, blocklist: DataFrame): DataFrame =
    stats.join(
        broadcast(blocklist.select(col("domain"), lit(1L).as("blocked"))),
        Seq("domain"), "left")
      .withColumn("blocked", coalesce(col("blocked"), lit(0L)))
}
