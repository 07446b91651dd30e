package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(input: String): String =
    Seq(input).toDF("v")
      .select(UrlOps.canonicalizeUrl(col("v")).as("out"))
      .collect().head.getString(0)

  test("canonicalizeUrl: case-folds scheme+authority only, path/query " +
      "case survives") {
    assert(canon("HTTP://WWW.Ex.COM/Path?Q=Vv") ==
      "http://www.ex.com/Path?Q=Vv")
  }

  test("canonicalizeUrl: default ports dropped, non-default kept") {
    assert(canon("http://h.com:80/p") == "http://h.com/p")
    assert(canon("https://h.com:443/p") == "https://h.com/p")
    assert(canon("http://h.com:8080/p") == "http://h.com:8080/p")
    // :443 is NOT default for http
    assert(canon("http://h.com:443/p") == "http://h.com:443/p")
    assert(canon("http://h.com:80") == "http://h.com")
  }

  test("canonicalizeUrl: fragments and trailing separators stripped") {
    assert(canon("http://h.com/p#sec-2") == "http://h.com/p")
    assert(canon("http://h.com/") == "http://h.com")
    assert(canon("http://h.com/p?") == "http://h.com/p")
  }

  test("canonicalizeUrl: utm params stripped in every position, " +
      "adjacent runs included; non-utm params survive") {
    assert(canon("http://h.com/p?utm_source=a&x=1") == "http://h.com/p?x=1")
    assert(canon("http://h.com/p?x=1&utm_a=1&utm_b=2") ==
      "http://h.com/p?x=1")
    assert(canon("http://h.com/p?utm_a=1&utm_b=2") == "http://h.com/p")
    assert(canon("http://h.com/p?utm_a=1") == "http://h.com/p")
  }

  test("canonicalizeUrl: duplicate slashes collapse in the path, " +
      "never in the scheme") {
    assert(canon("http://h.com//a///b") == "http://h.com/a/b")
  }

  test("canonicalizeUrl: total on non-URL strings") {
    assert(canon("not a url #x") == "not a url")
    assert(canon("  plain  ") == "plain")
  }

  test("canonicalizeUrl: newline-bearing edges — trim() misses them " +
      "and Java/RE2 disagree on $ before a final terminator, so the " +
      "edge strip must neutralize them before any anchored step") {
    assert(canon("http://H.com/p/\n") == "http://h.com/p")
    assert(canon("\thttp://h.com:80/p ") == "http://h.com/p")
    // fragment removal crosses internal newlines ([\s\S], not .*)
    assert(canon("http://h.com/p#frag\nmore") == "http://h.com/p")
  }

  test("canonicalizeUrl is idempotent on seeded random messy URLs " +
      "(a canonical form must be a fixed point)") {
    val rnd = new scala.util.Random(41L)
    val schemes = Seq("http", "HTTP", "https", "HTTPS", "ftp")
    val urls = (0 until 300).map { i =>
      val b = new StringBuilder
      b ++= schemes(rnd.nextInt(schemes.size)) ++= "://"
      b ++= (if (rnd.nextBoolean()) "WWW." else "") ++= s"Host$i.COM"
      if (rnd.nextBoolean()) b ++= Seq(":80", ":443", ":8080")(rnd.nextInt(3))
      (0 until rnd.nextInt(4)).foreach { _ =>
        b ++= "/" * (1 + rnd.nextInt(3)) ++= s"p${rnd.nextInt(10)}"
      }
      if (rnd.nextBoolean()) {
        b ++= "?" ++= (if (rnd.nextBoolean()) "utm_src=1" else "x=1")
        (0 until rnd.nextInt(3)).foreach { _ =>
          b ++= (if (rnd.nextBoolean()) "&utm_a=2" else "&y=3")
        }
      }
      if (rnd.nextBoolean()) b ++= "#frag"
      b.result()
    }
    val once = urls.toDF("v")
      .select(UrlOps.canonicalizeUrl(col("v")).as("c"))
    val twice = once.select(col("c"),
      UrlOps.canonicalizeUrl(col("c")).as("cc"))
      .filter(col("c") =!= col("cc"))
    assert(twice.count() == 0,
      s"non-fixed-points: ${twice.take(5).mkString("; ")}")
  }

  test("hostOf + hrefs: host of canonical form; src attributes ignored") {
    val df = Seq(
      """<a href="http://A.com/1">x</a><img src="http://b.com/i"/>""" +
        """<a href="https://c.com:443/2#f">y</a>""").toDF("v")
    val r = df.select(
      transform(UrlOps.hrefs(col("v")),
        u => UrlOps.hostOf(UrlOps.canonicalizeUrl(u))).as("hosts"))
      .collect().head.getSeq[String](0)
    assert(r == Seq("a.com", "c.com"))
  }
}
