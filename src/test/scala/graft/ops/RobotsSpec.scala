package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit edges for [[Robots]] beyond the gate's planted classes:
  * no-robots hosts, exact length ties, `*` fallback, group boundaries,
  * and the empty-Disallow no-op. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def allowed(robots: Seq[(String, String)],
                      frontier: Seq[(Long, String, String)],
                      agent: String = "bot"): Map[Long, Boolean] =
    Robots.evaluate(
        frontier.toDF("doc_id", "host", "path"),
        robots.toDF("host", "robots"), agent)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap

  test("no robots entry for a host, or no matching rule: allowed") {
    val out = allowed(
      Seq(("a.com", "User-agent: bot\nDisallow: /x")),
      Seq((1L, "a.com", "/y"), (2L, "b.com", "/anything")))
    assert(out === Map(1L -> true, 2L -> true))
  }

  test("equal-length Allow and Disallow: the Allow wins (RFC 9309 " +
    "least-restrictive tie-break)") {
    val out = allowed(
      Seq(("a.com", "User-agent: bot\nDisallow: /ab\nAllow: /ab")),
      Seq((1L, "a.com", "/ab/x")))
    assert(out === Map(1L -> true))
  }

  test("longest match wins regardless of rule order") {
    val out = allowed(
      Seq(("a.com",
        "User-agent: bot\nAllow: /dir/keep\nDisallow: /dir\nAllow: /d")),
      Seq((1L, "a.com", "/dir/keep/x"), (2L, "a.com", "/dir/drop"),
        (3L, "a.com", "/dx")))
    assert(out === Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("* group applies only when no group names the token; a second " +
    "User-agent run starts a new group") {
    val txt = "User-agent: other\nDisallow: /o\n" +
      "User-agent: *\nDisallow: /g\n"
    val out = allowed(
      Seq(("a.com", txt)),
      Seq((1L, "a.com", "/g/x"), (2L, "a.com", "/o/x")))
    // bot is not named: the * group's /g applies, other's /o does not
    assert(out === Map(1L -> false, 2L -> true))
  }

  test("empty Disallow is a no-op; comments and junk lines are ignored") {
    val txt = "# top comment\nUser-agent: bot # trailing\n" +
      "Disallow:\nnot a directive\nCrawl-delay: 10\nDisallow: /x\n"
    val out = allowed(
      Seq(("a.com", txt)),
      Seq((1L, "a.com", "/x/1"), (2L, "a.com", "/free")))
    assert(out === Map(1L -> false, 2L -> true))
  }
}
