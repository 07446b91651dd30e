package graft.ops

import java.util.Locale

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Seeded cross-implementation fuzz for the URL canonicalization
  * chain — the last regex-chain parser family verified on fixtures
  * alone (WARC framing and the XML round-trip got theirs in r11;
  * `canonicalizeUrl` seeds `q_url_canonicalize`/`q_url_dedup` and the
  * whole host-graph family, so a silent divergence poisons frontier
  * dedup). Each step of the documented chain (UrlOps.scala) is
  * replayed by an INDEPENDENT straight-line scanner — index walks, no
  * java.util.regex — including the two Java-regex corner semantics
  * the chain inherits and the fixtures never exercise:
  *
  *  - `$` matches before ONE final line terminator: a trailing
  *    newline exposed by fragment-stripping ("a \n#f" → "a \n") does
  *    NOT stop the port-strip or trailing-junk steps, but TWO
  *    trailing newlines do (the run before them is not "at $").
  *  - negated classes cross newlines while `.` does not: an authority
  *    may contain \n, and a `?utm_` tail swallows an embedded \n on
  *    its way to end-of-string, but the port-strip's `([/?#].*)?$`
  *    group fails on any INTERNAL newline after the port.
  *
  * Fixed seeds — failures reproduce. */
@org.scalatest.tags.Slow
class UrlCanonFuzzSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference (straight-line, no regex) ----

  private val Ws = " \t\n\r\f"

  private def edgeTrim(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && Ws.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && Ws.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(a, b)
  }

  /** (body, final line terminator) — the terminator `$` can sit
    * before: exactly one of "\r\n", "\n", "\r" at absolute end. */
  private def splitFinalTerm(s: String): (String, String) =
    if (s.endsWith("\r\n")) (s.dropRight(2), "\r\n")
    else if (s.endsWith("\n") || s.endsWith("\r"))
      (s.dropRight(1), s.takeRight(1))
    else (s, "")

  private def isSchemeChar(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || c == '+' || c == '.' || c == '-'

  /** Length of the `^scheme://authority` prefix, 0 if none. The
    * scheme class excludes ':', so the regex's "://" colon is
    * necessarily the FIRST colon of the string — a first-colon scan
    * is exact. Authority = everything up to '/', '?', '#' or end
    * (spaces and newlines included: the negated class crosses them). */
  private def schemeHostLen(s: String, lowerOnly: Boolean): Int = {
    val i = s.indexOf(':')
    if (i < 1) return 0
    val c0 = s.charAt(0)
    val headOk = (if (lowerOnly) c0 >= 'a' && c0 <= 'z'
                  else c0.isLetter && c0 < 128) &&
      (1 until i).forall(j => isSchemeChar(s.charAt(j)) &&
        (!lowerOnly || !s.charAt(j).isUpper))
    if (!headOk || !s.startsWith("://", i)) return 0
    var j = i + 3
    while (j < s.length && "/?#".indexOf(s.charAt(j)) < 0) j += 1
    j
  }

  /** `([/?#].*)?$` against the remainder after ":80"/":443": empty,
    * or a lone final terminator, or starts with /?# and carries no
    * internal \r or \n before an optional final terminator. */
  private def portTailOk(rest: String): Boolean = {
    if (rest.isEmpty) return true
    val (body, _) = splitFinalTerm(rest)
    if (body.isEmpty) return true
    "/?#".indexOf(body.charAt(0)) >= 0 &&
      !body.exists(c => c == '\n' || c == '\r')
  }

  private def stripDefaultPort(s: String): String = {
    val scheme = if (s.startsWith("http://")) "http://"
                 else if (s.startsWith("https://")) "https://" else ""
    if (scheme.isEmpty) return s
    val port = if (scheme == "http://") ":80" else ":443"
    var j = scheme.length
    while (j < s.length && "/?#:".indexOf(s.charAt(j)) < 0) j += 1
    if (j < s.length && s.startsWith(port, j) &&
        portTailOk(s.substring(j + port.length)))
      s.substring(0, j) + s.substring(j + port.length)
    else s
  }

  /** `&utm_[^&#]*` → "" with replaceAll semantics: walk the ORIGINAL
    * string left to right, never rescanning replaced output. Inputs
    * are post-fragment-strip, so no '#' exists and the stop set is
    * just '&'. */
  private def stripAmpUtm(s: String): String = {
    val out = new StringBuilder; var i = 0
    while (i < s.length) {
      if (s.startsWith("&utm_", i)) {
        i += 5
        while (i < s.length && s.charAt(i) != '&') i += 1
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** `[?]utm_[^&#]*&` → "?": the run's class excludes '&', so the
    * required trailing '&' is exactly the char that stopped the run. */
  private def stripQUtmAmp(s: String): String = {
    val out = new StringBuilder; var i = 0
    while (i < s.length) {
      var matched = false
      if (s.startsWith("?utm_", i)) {
        var j = i + 5
        while (j < s.length && s.charAt(j) != '&') j += 1
        if (j < s.length) { out.append('?'); i = j + 1; matched = true }
      }
      if (!matched) { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** `[?]utm_[^&#]*$` → "": the run crosses newlines (negated class),
    * so it reaches absolute end unless an '&' intervenes — the first
    * "?utm_" with no later '&' truncates the string there. */
  private def stripQUtmEnd(s: String): String = {
    var i = s.indexOf("?utm_")
    while (i >= 0) {
      if (s.indexOf('&', i + 5) < 0) return s.substring(0, i)
      i = s.indexOf("?utm_", i + 1)
    }
    s
  }

  /** `([^:])/{2,}` → "$1/": the matched region includes the guard
    * char, so scanning continues after the collapsed run. */
  private def collapseSlashes(s: String): String = {
    val out = new StringBuilder; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var n = i + 1
      while (n < s.length && s.charAt(n) == '/') n += 1
      if (c != ':' && n - i - 1 >= 2) { out.append(c).append('/'); i = n }
      else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** `[/?&]+$` → "": the run must end at `$` — absolute end or before
    * ONE final terminator. Two trailing newlines shield the run. */
  private def stripTrail(s: String): String = {
    val (body, term) = splitFinalTerm(s)
    var b = body.length
    while (b > 0 && "/?&".indexOf(body.charAt(b - 1)) >= 0) b -= 1
    body.substring(0, b) + term
  }

  private def refCanon(raw: String): String = {
    val t0 = edgeTrim(raw)
    val nf = { val i = t0.indexOf('#'); if (i >= 0) t0.substring(0, i) else t0 }
    val shLen = schemeHostLen(nf, lowerOnly = false)
    val lowered =
      if (shLen == 0) nf
      else nf.substring(0, shLen).toLowerCase(Locale.ROOT) + nf.substring(shLen)
    val ports = stripDefaultPort(lowered)
    val utm = stripQUtmEnd(stripQUtmAmp(stripAmpUtm(ports)))
    edgeTrim(stripTrail(collapseSlashes(utm)))
  }

  private def refHost(canon: String): String = {
    val n = schemeHostLen(canon, lowerOnly = true)
    if (n == 0) return ""
    val start = canon.indexOf("://") + 3
    var j = start
    while (j < canon.length && ":/?#".indexOf(canon.charAt(j)) < 0) j += 1
    canon.substring(start, j)
  }

  private def refHrefs(html: String): Seq[String] = {
    val out = Seq.newBuilder[String]; var i = html.indexOf("href=\"")
    while (i >= 0) {
      val close = html.indexOf('"', i + 6)
      if (close < 0) return out.result()
      out += html.substring(i + 6, close)
      i = html.indexOf("href=\"", close + 1)
    }
    out.result()
  }

  // ---- generators ----

  private val wsParts = Array("", " ", "\t", "\n", "\r\n", " \n ", "\n\n", "\f")
  private val schemes = Array("http", "https", "HTTP", "HTTPS", "Http",
    "hTtPs", "ftp", "a+b-c.x", "1bad", "ht tp", "")
  private val seps = Array("://", ":/", "//", ":", "")
  private val hostsArr = Array("example.com", "Example.COM", "EXAMPLE.com",
    "ho st", "h\nst", "a@b", "a.b.c", "", "x-y_z", "127.0.0.1", "h&utm_x")
  private val portsArr = Array("", ":80", ":443", ":8080", ":080", ":80x",
    ":443x", ":8", "::80", ":80:80")
  private val pathsArr = Array("", "/", "//", "/a/b", "/a//b", "///a",
    "/A/B", "/a b", "/a\nb", "/a\rb", "/%2F", "/a/", "/a//", "/utm_a")
  private val queries = Array("", "?a=1", "?utm_source=x", "?utm_a&b=2",
    "?b=2&utm_a", "?utm_a&utm_b", "?utm_", "?utm_a&utm_b&c=3",
    "?a=1&utm_b&c=2", "??a", "?&", "?a=1&", "?utm_a\nb", "?utm_a\n")
  private val frags = Array("", "#f", "#", "#a#b", "#utm_x", "#\n", "# f")
  private val spliceVocab = Array("http://", "HTTP://", "://", ":80",
    ":443", "utm_x", "&utm_", "?utm_", "#", "//", "///", "/", "&", "?",
    " ", "\n", "\r\n", "\r", "\t", "\f", "a", "B", ".", ":", "x=1",
    "example.COM", "@", "%2F", "É", "🏠", ":80/", ":443\n", "&utm_a&")

  test("canonicalizeUrl + hostOf == independent straight-line " +
      "reference on seeded adversarial URLs (>= 1400 cases, 2 seeds)") {
    val inputs = Seq.newBuilder[String]
    for (seed <- Seq(17L, 31L)) {
      val rnd = new Random(seed)
      def pick(a: Array[String]) = a(rnd.nextInt(a.length))
      inputs ++= (1 to 400).map { _ =>
        pick(wsParts) + pick(schemes) + pick(seps) + pick(hostsArr) +
          pick(portsArr) + pick(pathsArr) + pick(queries) + pick(frags) +
          pick(wsParts)
      }
      inputs ++= (1 to 300).map { _ =>
        (0 until rnd.nextInt(12))
          .map(_ => spliceVocab(rnd.nextInt(spliceVocab.length))).mkString
      }
    }
    val rows = inputs.result().distinct.toDF("s")
      .select(col("s"), UrlOps.canonicalizeUrl(col("s")).as("c"))
      .withColumn("h", UrlOps.hostOf(col("c")))
      .collect()
    assert(rows.length >= 1000)
    def esc(x: String) = x.flatMap {
      case '\n' => "\\n"; case '\r' => "\\r"; case '\t' => "\\t"
      case '\f' => "\\f"; case c => c.toString
    }
    rows.foreach { r =>
      val (s, c, h) = (r.getString(0), r.getString(1), r.getString(2))
      assert(c === refCanon(s),
        s"canonicalizeUrl divergence on [${esc(s)}]: " +
          s"spark=[${esc(c)}] ref=[${esc(refCanon(s))}]")
      assert(h === refHost(c),
        s"hostOf divergence on canonical [${esc(c)}]: " +
          s"spark=[${esc(h)}] ref=[${esc(refHost(c))}]")
    }
  }

  test("hrefs == independent scanner on 300 seeded splices") {
    val vocab = Array("href=\"", "\"", "a", "<a ", ">", "href=", " ",
      "\n", "x.y/z", "#f", "HREF=\"", "'", "href=\"\"", "h", "=\"")
    val rnd = new Random(7L)
    val inputs = (1 to 300).map { _ =>
      (0 until rnd.nextInt(14)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString
    }
    val rows = inputs.distinct.toDF("s")
      .select(col("s"), UrlOps.hrefs(col("s")).as("hs")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === refHrefs(r.getString(0)),
        s"hrefs divergence on: ${r.getString(0)}")
    }
  }
}
