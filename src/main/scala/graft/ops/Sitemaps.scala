package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap ingestion — the frontier-SEEDING side of crawl governance
  * (robots says what may be fetched, sitemaps say what the site wants
  * fetched): parse stored sitemap XML into (url, lastmod) rows and
  * seed the frontier with the entries not already crawled. Per-row
  * regex scan over KB-sized XML documents plus one anti-join on the
  * canonical URL — nothing corpus-sized shuffles beyond the join key.
  *
  * Scope: the sitemaps.org `<urlset>` document — `<url>` entries with
  * `<loc>` (required; entries without one are skipped, like a
  * validating crawler) and optional `<lastmod>` (absent → null).
  * `<sitemapindex>` documents list child sitemaps, not pages: their
  * `<loc>` values are returned by [[childSitemaps]] for the fetch
  * layer to enqueue — recursion is a fetch-loop concern, not a parse
  * concern. Values are whitespace-trimmed; CDATA is out of scope
  * (rare in practice, and a documented subset beats a half-right XML
  * parser). */
object Sitemaps {

  private val urlBlock = "(?s)<url>.*?</url>"
  private def tag(name: String) = s"(?s)<$name>\\s*(.*?)\\s*</$name>"

  /** Explode a sitemap column into (loc, lastmod) entry rows; rows of
    * `df` multiply by their entry count, other columns carry over.
    * Entries without a `<loc>` are dropped. */
  def entries(df: DataFrame, xmlCol: String): DataFrame =
    df.withColumn("__u",
        explode(regexp_extract_all(col(xmlCol), lit(urlBlock), lit(0))))
      .withColumn("loc", regexp_extract(col("__u"), tag("loc"), 1))
      .filter(length(col("loc")) > 0)
      .withColumn("lastmod",
        when(col("__u").rlike(tag("lastmod")),
          regexp_extract(col("__u"), tag("lastmod"), 1)))
      .drop("__u", xmlCol)

  /** The child sitemap locations of a `<sitemapindex>` document. */
  def childSitemaps(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?s)<sitemap>.*?</sitemap>"), lit(0)),
      b => regexp_extract(b, tag("loc"), 1))

  /** Seed the frontier: sitemap entries whose CANONICAL url is not in
    * `crawled(urlCol)` — canonicalization on both sides so tracking-
    * param/fragment variants of an already-crawled page do not re-
    * enqueue ([[UrlOps.canonicalizeUrl]]). One anti-join on the
    * canonical key. */
  def seedFrontier(entries: DataFrame, crawled: DataFrame,
                   urlCol: String): DataFrame = {
    val canon = entries
      .withColumn("canonical_url", UrlOps.canonicalizeUrl(col("loc")))
    val seen = crawled
      .select(UrlOps.canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .distinct()
    canon.join(seen, Seq("canonical_url"), "left_anti")
  }
}
