package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt evaluation — the crawl-governance gate every corpus
  * fetch pipeline runs before a URL may even be fetched (and re-runs
  * retroactively when takedown/licensing sweeps re-audit a stored
  * corpus at 100 TB). RFC 9309 semantics over the common prefix-rule
  * subset:
  *
  *  - lines parse as `key: value` with `#` comments stripped; only
  *    `user-agent` / `allow` / `disallow` / `crawl-delay` keys
  *    considered, keys case-insensitive;
  *  - a GROUP is a maximal run of consecutive User-agent lines plus
  *    the rules that follow it (until the next User-agent run);
  *  - for a product token, groups naming it (case-insensitive exact)
  *    apply; only if NONE does do the `*` groups apply; a host with no
  *    applicable group allows everything;
  *  - a non-empty rule value matches a path by PREFIX (`Disallow:`
  *    with an empty value is a no-op per the RFC); the verdict is the
  *    LONGEST matching rule, an Allow winning length ties (the RFC's
  *    least-restrictive tie-break). `*`/`$` wildcard rules are out of
  *    scope (documented subset — the overwhelming majority of real
  *    rules are plain prefixes).
  *
  * Scale shape: parsing explodes each robots file once (a robots file
  * is KB-sized, the per-host group structure is a tiny window over its
  * own lines), and evaluation is ONE equi-join on host — frontier ×
  * per-host-rules, each rule row a short string — followed by a
  * partial-aggregable max. The longest-match-with-tie-break verdict
  * folds into one integer: `2·len(prefix) + isAllow`, so the argmax is
  * a plain `max()` (no struct ordering, no window) and the SQL oracle
  * replays it with the same arithmetic. */
object Robots {

  /** Parse + group + group-applicability — shared by the rule and
    * crawl-delay readers: considered lines (`user-agent` / `allow` /
    * `disallow` / `crawl-delay`, comments stripped, keys folded)
    * tagged with their User-agent-run group id, plus the set of
    * groups governing `agent` on each host (specific-over-generic). */
  private def applicableLines(robots: DataFrame, agent: String,
                              hostCol: String, txtCol: String)
      : (DataFrame, DataFrame) = {
    val lines = robots.select(col(hostCol).as("host"),
      posexplode(split(col(txtCol), "\n")).as(Seq("ln", "raw")))
    val parsed = lines
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .filter(instr(col("line"), ":") > 0)
      .withColumn("key", lower(trim(substring_index(col("line"), ":", 1))))
      .withColumn("value",
        trim(expr("substring(line, instr(line, ':') + 1)")))
      .filter(col("key").isin("user-agent", "allow", "disallow",
        "crawl-delay"))
    val w = Window.partitionBy("host").orderBy("ln")
    val grouped = parsed
      .withColumn("is_ua", (col("key") === "user-agent").cast("int"))
      .withColumn("prev_ua", lag("is_ua", 1, 0).over(w))
      .withColumn("grp",
        sum(when(col("is_ua") === 1 && col("prev_ua") === 0, 1)
          .otherwise(0)).over(w))
    val uaSets = grouped.filter(col("key") === "user-agent")
      .groupBy("host", "grp")
      .agg(
        max((lower(col("value")) === agent.toLowerCase).cast("int"))
          .as("specific"),
        max((col("value") === "*").cast("int")).as("generic"))
    val hostSpec = uaSets.groupBy("host")
      .agg(max("specific").as("has_spec"))
    val applicable = uaSets.join(hostSpec, "host")
      .filter((col("has_spec") === 1 && col("specific") === 1) ||
        (col("has_spec") === 0 && col("generic") === 1))
      .select("host", "grp")
    (grouped, applicable)
  }

  /** Exploded applicable-rule table for `agent`:
    * `(host, is_allow, prefix)` — only rules from the groups that
    * govern `agent` on each host, empty-value rules dropped. */
  def rules(robots: DataFrame, agent: String,
            hostCol: String = "host", txtCol: String = "robots"): DataFrame = {
    val (grouped, applicable) =
      applicableLines(robots, agent, hostCol, txtCol)
    grouped
      .filter(col("key").isin("allow", "disallow") &&
        length(col("value")) > 0)
      .join(applicable, Seq("host", "grp"))
      .select(col("host"), (col("key") === "allow").as("is_allow"),
        col("value").as("prefix"))
  }

  /** `frontier(idCol, hostCol, pathCol)` + `allowed` for `agent` under
    * each host's robots. One equi-join on host + one max — the
    * longest-match verdict as `max(2·len + isAllow)`: odd = allowed,
    * even = denied, null (no matching rule / no robots) = allowed. */
  def evaluate(frontier: DataFrame, robots: DataFrame, agent: String,
               idCol: String = "doc_id", hostCol: String = "host",
               pathCol: String = "path"): DataFrame = {
    val r = rules(robots, agent)
    val scored = frontier
      .select(col(idCol), col(hostCol).as("host"), col(pathCol).as("path"))
      .join(r, Seq("host"), "left")
      .withColumn("score",
        when(col("prefix").isNotNull &&
          col("path").startsWith(col("prefix")),
          length(col("prefix")) * 2 + col("is_allow").cast("int")))
    scored.groupBy(col(idCol), col("host"), col("path"))
      .agg(max(col("score")).as("s"))
      .select(col(idCol), col("host"), col("path"),
        (col("s").isNull || col("s") % 2 === 1).as("allowed"))
  }

  /** Per-host crawl delay in milliseconds for `agent` — the
    * `Crawl-delay` politeness extension (de facto standard; seconds,
    * fractional allowed), read from the SAME applicable groups as the
    * allow/disallow rules (specific-over-generic). Several applicable
    * delays → the maximum (the conservative crawler's choice); hosts
    * without one get `defaultMs`. Exact integer milli: the seconds
    * value parses as a scaled decimal, never a double. */
  def crawlDelaysMs(robots: DataFrame, agent: String,
                    defaultMs: Long = 1000L,
                    hostCol: String = "host",
                    txtCol: String = "robots"): DataFrame = {
    val (grouped, applicable) =
      applicableLines(robots, agent, hostCol, txtCol)
    grouped.filter(col("key") === "crawl-delay")
      .join(applicable, Seq("host", "grp"))
      .withColumn("__ms",
        (col("value").try_cast("decimal(12,3)") * 1000).try_cast("long"))
      .filter(col("__ms").isNotNull)
      .groupBy("host")
      .agg(max(col("__ms")).as("delay_ms"))
      .select(col("host"), col("delay_ms"))
  }

  /** Politeness SCHEDULE for an (allowed) frontier: within each host,
    * fetches order by `orderCol` and slot k departs at
    * `k · delay_ms` (host delays from [[crawlDelaysMs]], `defaultMs`
    * where a host declares none). One window per HOST partition —
    * per-host frontier slices, never a global sort — plus a broadcast-
    * sized join on host: the shape a 1000-executor fetch planner
    * needs. `hostCol`/`txtCol` name the ROBOTS frame's columns (as in
    * [[rules]]); the FRONTIER contract is fixed — `host` plus
    * `orderCol` — since [[crawlDelaysMs]] always emits
    * `(host, delay_ms)`. */
  def fetchSchedule(frontier: DataFrame, robots: DataFrame, agent: String,
                    orderCol: String, defaultMs: Long = 1000L,
                    hostCol: String = "host",
                    txtCol: String = "robots"): DataFrame = {
    val delays = crawlDelaysMs(robots, agent, defaultMs, hostCol, txtCol)
    val w = Window.partitionBy("host").orderBy(col(orderCol))
    frontier
      .join(broadcast(delays), Seq("host"), "left")
      .withColumn("delay_ms", coalesce(col("delay_ms"), lit(defaultMs)))
      .withColumn("slot", row_number().over(w).cast("long") - 1)
      .withColumn("start_ms", col("slot") * col("delay_ms"))
  }
}
