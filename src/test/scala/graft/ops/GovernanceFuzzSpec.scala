package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Seeded cross-implementation fuzz for the crawl-governance code —
  * r9 verdict item 6: governance is where a silent divergence costs a
  * real crawl, so the hand-built decision-table oracles get a second,
  * randomized line of defense. Each Spark operator is replayed by an
  * INDEPENDENT straight-line Scala reimplementation of its documented
  * semantics (the RFC-9309 prefix subset for robots; the documented
  * regex chain for stripHtml), over generated corpora the operators
  * never saw during development. Fixed seeds — failures reproduce. */
@org.scalatest.tags.Slow
class GovernanceFuzzSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference robots evaluator (independent reimplementation) ----

  /** Spark `trim` removes ASCII spaces only — replicated exactly. */
  private def trimSp(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  private case class RLine(key: String, value: String, grp: Int)

  /** Parse + group per the documented pipeline: comments stripped,
    * space-trimmed, `key: value` on the FIRST colon, only the four
    * considered keys kept — and the User-agent-run grouping counts
    * runs over the CONSIDERED sequence (junk between two UA lines
    * does not split their run, exactly like the windowed lag over the
    * filtered frame). */
  private def parseRobots(txt: String): Seq[RLine] = {
    val considered = txt.split("\n", -1).toSeq
      .map(raw => trimSp(raw.replaceAll("#.*$", "")))
      .filter(_.indexOf(':') >= 0)
      .map { line =>
        val i = line.indexOf(':')
        (trimSp(line.substring(0, i)).toLowerCase,
          trimSp(line.substring(i + 1)))
      }
      .filter { case (k, _) =>
        Set("user-agent", "allow", "disallow", "crawl-delay")(k) }
    var grp = 0; var prevUa = false
    considered.map { case (k, v) =>
      val isUa = k == "user-agent"
      if (isUa && !prevUa) grp += 1
      prevUa = isUa
      RLine(k, v, grp)
    }
  }

  /** Group ids governing `agent`: groups naming it case-insensitively
    * if any do, else the `*` groups. */
  private def applicableGroups(lines: Seq[RLine], agent: String): Set[Int] = {
    val ua = lines.filter(_.key == "user-agent")
    val spec = ua.filter(_.value.toLowerCase == agent.toLowerCase)
      .map(_.grp).toSet
    if (spec.nonEmpty) spec
    else ua.filter(_.value == "*").map(_.grp).toSet
  }

  /** Longest-match verdict: max over matching non-empty applicable
    * rules of `2·len + isAllow`; none → allowed; odd → allowed. */
  private def refAllowed(lines: Seq[RLine], agent: String,
                         path: String): Boolean = {
    val groups = applicableGroups(lines, agent)
    val scores = lines.filter(l =>
      (l.key == "allow" || l.key == "disallow") && l.value.nonEmpty &&
        groups(l.grp) && path.startsWith(l.value))
      .map(l => 2 * l.value.length + (if (l.key == "allow") 1 else 0))
    scores.isEmpty || scores.max % 2 == 1
  }

  /** Max applicable crawl-delay in exact milli (3-decimal values in
    * the generator, so decimal scaling has no rounding edge), None if
    * no applicable parseable delay. */
  private def refDelayMs(lines: Seq[RLine], agent: String): Option[Long] = {
    val groups = applicableGroups(lines, agent)
    val ds = lines.filter(l => l.key == "crawl-delay" && groups(l.grp))
      .flatMap(l => scala.util.Try(BigDecimal(l.value)).toOption)
      .map(d => (d * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong)
    if (ds.isEmpty) None else Some(ds.max)
  }

  private val prefixes = Array("/", "/a", "/a/b", "/a/b/c", "/ab", "/b",
    "/abc", "/b/c", "/x?y=1", "/A")
  private val paths = Array("/", "/a", "/a/b", "/a/b/c", "/a/bc", "/ab",
    "/abc", "/abcd", "/b", "/b/c/d", "/x?y=1", "/x?y=12", "/A", "/A/b")

  private def randomRobots(rnd: Random): String = {
    def prefix() = prefixes(rnd.nextInt(prefixes.length))
    def line(): String = rnd.nextInt(14) match {
      case 0 => "User-agent: graftbot"
      case 1 => "User-agent: *"
      case 2 => "user-agent: GRAFTBOT"      // case-folded match
      case 3 => "User-agent: otherbot"
      case 4 => s"Allow: ${prefix()}"
      case 5 => s"Disallow: ${prefix()}"
      case 6 => s"disallow:${prefix()}"     // no space after colon
      case 7 => s"  Allow: ${prefix()}"     // leading spaces
      case 8 => "Disallow:"                 // empty value: no-op
      case 9 => s"Allow: ${prefix()} # inline comment"
      case 10 => "# full-line comment"
      case 11 => "random junk without structure"
      case 12 => s"Crawl-delay: ${rnd.nextInt(5)}.${rnd.nextInt(1000)}"
      case 13 => "Sitemap: http://example.test/s.xml" // unconsidered key
    }
    (0 until 3 + rnd.nextInt(15)).map(_ => line()).mkString("\n")
  }

  test("robots longest-match evaluator == independent reference on " +
      "seeded random robots files (>= 600 verdicts, 2 seeds)") {
    for (seed <- Seq(11L, 23L)) {
      val rnd = new Random(seed)
      val agent = "GraftBot" // mixed case: exercises the fold
      val hosts = (0 until 12).map(i => (s"h$i.test", randomRobots(rnd)))
      val robots = hosts.toDF("host", "robots")
      // one frontier host with NO robots row at all: must be allowed
      val frontier = (hosts.map(_._1) :+ "norobots.test").zipWithIndex
        .flatMap { case (h, hi) =>
          (0 until 25).map { pi =>
            ((hi * 100 + pi).toLong, h, paths(rnd.nextInt(paths.length)))
          }
        }
      val fdf = frontier.toDF("doc_id", "host", "path")
      val got = Robots.evaluate(fdf, robots, agent)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      val parsed = hosts.map { case (h, t) => h -> parseRobots(t) }.toMap
      frontier.foreach { case (id, h, p) =>
        val exp = parsed.get(h).forall(refAllowed(_, agent, p))
        assert(got(id) === exp,
          s"seed=$seed host=$h path=$p: spark=${got(id)} ref=$exp\n" +
            s"robots:\n${parsed.getOrElse(h, Nil).mkString("\n")}")
      }
    }
  }

  test("crawlDelaysMs == independent reference on the same corpora " +
      "(>= 300 seeded hosts)") {
    for (seed <- Seq(11L, 23L)) {
      val rnd = new Random(seed)
      val agent = "GraftBot"
      val hosts = (0 until 150).map(i => (s"h$i.test", randomRobots(rnd)))
      val got = Robots.crawlDelaysMs(hosts.toDF("host", "robots"), agent)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      hosts.foreach { case (h, t) =>
        val exp = refDelayMs(parseRobots(t), agent)
        assert(got.get(h) === exp,
          s"seed=$seed host=$h: spark=${got.get(h)} ref=$exp\nrobots:\n$t")
      }
    }
  }

  // ---- sitemap parser vs an independent scanner ---------------------

  /** Hand-rolled scanner (indexOf, no regex) for the documented
    * sitemaps.org subset: first-closing-tag blocks, first `<loc>` /
    * `<lastmod>` inside a block, `\s`-trimmed values, loc-less or
    * empty-loc entries dropped, absent lastmod → None. */
  private def refSitemapEntries(xml: String): Seq[(String, Option[String])] = {
    def innerFirst(s: String, tagN: String): Option[String] = {
      val open = s.indexOf(s"<$tagN>")
      if (open < 0) None
      else {
        val from = open + tagN.length + 2
        val close = s.indexOf(s"</$tagN>", from)
        if (close < 0) None
        else {
          var a = from; var b = close
          def ws(c: Char) = c == ' ' || c == '\t' || c == '\n' ||
            c == '\u000B' || c == '\f' || c == '\r'
          while (a < b && ws(s.charAt(a))) a += 1
          while (b > a && ws(s.charAt(b - 1))) b -= 1
          Some(s.substring(a, b))
        }
      }
    }
    val out = scala.collection.mutable.ListBuffer[(String, Option[String])]()
    var pos = 0
    while (pos < xml.length) {
      val i = xml.indexOf("<url>", pos)
      if (i < 0) pos = xml.length
      else {
        val j = xml.indexOf("</url>", i + 5)
        if (j < 0) pos = xml.length
        else {
          val block = xml.substring(i + 5, j)
          innerFirst(block, "loc").filter(_.nonEmpty).foreach { loc =>
            out += ((loc, innerFirst(block, "lastmod")))
          }
          pos = j + 6
        }
      }
    }
    out.toSeq
  }

  test("sitemap entries == independent scanner on 300 seeded " +
      "spliced documents") {
    val rnd = new Random(7L)
    def url() = s"https://ex.test/p${rnd.nextInt(50)}"
    def frag(): String = rnd.nextInt(10) match {
      case 0 => s"<url><loc>${url()}</loc></url>"
      case 1 => s"<url>\n  <loc>\n    ${url()}\n  </loc>\n  " +
        s"<lastmod>2026-0${1 + rnd.nextInt(8)}-1${rnd.nextInt(9)}" +
        "</lastmod>\n</url>"
      case 2 => s"<url><lastmod>2026-01-01</lastmod></url>" // loc-less
      case 3 => s"<url><loc></loc></url>"                   // empty loc
      case 4 => s"<url><loc> ${url()} </loc>" +
        s"<priority>0.${rnd.nextInt(9)}</priority></url>"
      case 5 => "junk between entries"
      case 6 => s"<url><loc>${url()}</loc>"                 // unterminated
      case 7 => "<!-- comment -->\n"
      case 8 => s"<sitemap><loc>https://ex.test/s${rnd.nextInt(5)}" +
        ".xml</loc></sitemap>"
      case 9 => s"<url><loc>${url()}</loc><loc>${url()}</loc></url>"
    }
    val docs = (0 until 300).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(6)).map(_ => frag()).mkString("\n"))
    }
    val got = Sitemaps.entries(docs.toDF("doc_id", "xml"), "xml")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    docs.foreach { case (id, xml) =>
      val exp = refSitemapEntries(xml)
      assert(got.getOrElse(id, Seq.empty) === exp,
        s"doc $id: spark=${got.getOrElse(id, Seq.empty)} ref=$exp\n$xml")
    }
  }

  // ---- license detector vs an independent decision procedure --------

  /** Independent replay of the documented precedence: first
    * rel=license tag's href (either attribute order/quote style,
    * scanned tag-by-tag) → CC / CC0 / other mapping; else first SPDX
    * id; else the all-rights phrase; else none. */
  private def refLicense(page: String): String = {
    // first <a ...> or <link ...> tag (no '>' crossed) carrying
    // rel="license" and an href
    val tagStarts = Iterator.iterate(
        math.min(nonNeg(page.indexOf("<a")), nonNeg(page.indexOf("<link"))))(
        p => math.min(nonNeg(page.indexOf("<a", p + 1)),
          nonNeg(page.indexOf("<link", p + 1))))
      .takeWhile(_ < Int.MaxValue).take(1000).toSeq
    val href = tagStarts.iterator.map { i =>
      val end = page.indexOf('>', i)
      val tag = if (end < 0) page.substring(i) else page.substring(i, end)
      if (tag.contains("rel=\"license\"") || tag.contains("rel='license'")) {
        val h = "href=[\"']([^\"']*)[\"']".r.findFirstMatchIn(tag)
        h.map(_.group(1))
      } else None
    }.collectFirst { case Some(h) => h }
    href match {
      case Some(h) =>
        val cc = "(?i)creativecommons\\.org/licenses/([a-z-]+)/([0-9.]+)"
          .r.findFirstMatchIn(h)
        val cc0 = "(?i)creativecommons\\.org/publicdomain/zero/([0-9.]+)"
          .r.findFirstMatchIn(h)
        if (cc.isDefined)
          s"cc-${cc.get.group(1).toLowerCase}-${cc.get.group(2)}"
        else if (cc0.isDefined) s"cc0-${cc0.get.group(1)}"
        else "other-license-link"
      case None =>
        val spdx = "SPDX-License-Identifier:\\s*([A-Za-z0-9.+-]+)"
          .r.findFirstMatchIn(page)
        if (spdx.isDefined) s"spdx:${spdx.get.group(1)}"
        else if (page.toLowerCase.contains("all rights reserved"))
          "all-rights-reserved"
        else "none"
    }
  }

  private def nonNeg(i: Int): Int = if (i < 0) Int.MaxValue else i

  test("license detector == independent decision procedure on 300 " +
      "seeded composite pages") {
    val rnd = new Random(31L)
    def frag(): String = rnd.nextInt(12) match {
      case 0 => """<a rel="license" """ +
        """href="https://CreativeCommons.org/licenses/BY-SA/4.0/">cc</a>"""
      case 1 => """<link href='https://creativecommons.org/licenses/""" +
        s"""by/${2 + rnd.nextInt(3)}.0/' rel='license'>"""
      case 2 => """<a rel="license" """ +
        """href="https://creativecommons.org/publicdomain/zero/1.0/">z</a>"""
      case 3 => """<a rel="license" href="https://example.test/own">o</a>"""
      case 4 => s"<!-- SPDX-License-Identifier: ${Seq("MIT", "Apache-2.0",
        "GPL-3.0-only")(rnd.nextInt(3))} -->"
      case 5 => "All Rights Reserved."
      case 6 => "all rights reserved"
      case 7 => """<a href="https://example.test/x">plain link</a>"""
      case 8 => "plain paragraph text"
      case 9 => """<a rel="nofollow" """ +
        """href="https://creativecommons.org/licenses/by/4.0/">n</a>"""
      case 10 => "<p>rights</p>"
      case 11 => """<link rel="stylesheet" href="/s.css">"""
    }
    val pages = (0 until 300).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(4)).map(_ => frag()).mkString(" "))
    }
    val got = pages.toDF("doc_id", "page")
      .select(col("doc_id"), Licensing.detectLicense(col("page")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    pages.foreach { case (id, page) =>
      assert(got(id) === refLicense(page),
        s"page $id: spark=${got(id)} ref=${refLicense(page)}\n$page")
    }
  }

  // ---- stripHtml vs reference chain ---------------------------------

  /** The documented chain, straight-line: tags→space, six sequential
    * literal entity passes (`&amp;` last, output never re-read),
    * whitespace-run squeeze, space trim. */
  private def refStrip(s: String): String = {
    val noTags = s.replaceAll("<[^>]*>", " ")
    val ents = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val dec = ents.foldLeft(noTags) { case (a, (e, v)) => a.replace(e, v) }
    trimSp(dec.replaceAll("[ \\t\\n\\r\\f]+", " "))
  }

  test("stripHtml == independent reference on 300 seeded splices of " +
      "an adversarial vocabulary") {
    val vocab = Array("<b>", "</b>", "<p class='x'>", "<!-- c -->", "<",
      ">", "tag", "a", " ", "\t", "\n", "\f", "&lt;", "&gt;", "&amp;",
      "&amp;lt;", "&nbsp;", "&#39;", "&quot;", "&", "lt;", "text", "🏠",
      "é", "<unclosed", "x>y", "<x\ny>")
    val rnd = new Random(42)
    val inputs = (1 to 300).map { _ =>
      (0 until rnd.nextInt(16)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString
    }
    val rows = inputs.toDF("s")
      .select(col("s"), TextOps.stripHtml(col("s")).as("k")).collect()
    rows.foreach { r =>
      assert(r.getString(1) === refStrip(r.getString(0)),
        s"stripHtml divergence on input: ${r.getString(0)}")
    }
  }
}
