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
