package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edges for [[Sitemaps]] beyond the gate: sitemapindex children,
  * multiline entries, loc-less skipping, lastmod absence. */
class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  test("entries: multiline blocks parse, loc-less entries are " +
    "skipped, missing lastmod is null") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset>
        |  <url>
        |    <loc>
        |      https://a.com/1
        |    </loc>
        |    <lastmod>2024-02-03</lastmod>
        |  </url>
        |  <url><priority>0.3</priority></url>
        |  <url><loc>https://a.com/2</loc></url>
        |</urlset>""".stripMargin
    val out = Sitemaps.entries(
        Seq(("h1", xml)).toDF("host", "xml"), "xml")
      .orderBy("loc")
      .select("host", "loc", "lastmod").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq(
      ("h1", "https://a.com/1", "2024-02-03"),
      ("h1", "https://a.com/2", null)))
  }

  test("childSitemaps reads a sitemapindex, not page entries") {
    val idx =
      """<sitemapindex>
        |<sitemap><loc>https://a.com/sitemap-1.xml</loc></sitemap>
        |<sitemap><loc> https://a.com/sitemap-2.xml </loc></sitemap>
        |</sitemapindex>""".stripMargin
    val kids = Seq(Tuple1(idx)).toDF("xml")
      .select(Sitemaps.childSitemaps(col("xml"))).collect()
      .head.getSeq[String](0)
    assert(kids === Seq("https://a.com/sitemap-1.xml",
      "https://a.com/sitemap-2.xml"))
    // a urlset has no <sitemap> blocks: no children
    val none = Seq(Tuple1("<urlset><url><loc>x</loc></url></urlset>"))
      .toDF("xml")
      .select(Sitemaps.childSitemaps(col("xml"))).collect()
      .head.getSeq[String](0)
    assert(none.isEmpty)
  }
}
