package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: stages must occur in order; same-instant ties resolved " +
      "by tiebreak; later stages without predecessors don't count") {
    val ev = Seq(
      // user 1: view(10) -> click(20) -> purchase(30): full funnel
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "purchase"),
      // user 2: purchase BEFORE any click: stops at view
      (2L, 10L, 4L, "view"), (2L, 20L, 5L, "purchase"),
      (2L, 30L, 6L, "click"),
      // user 3: click with no view: reaches nothing
      (3L, 10L, 7L, "click"), (3L, 20L, 8L, "purchase"),
      // user 4: view and click at the SAME ts — tiebreak (event_id)
      // orders view first, so the click qualifies
      (4L, 10L, 9L, "view"), (4L, 10L, 10L, "click")
    ).toDF("u", "t", "eid", "kind")
    val out = Analytics.funnel(ev, "u", col("t"), col("eid"),
        col("kind"), Seq("view", "click", "purchase"))
      .orderBy("u")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 1L),
      (2L, 1L, 1L, 0L), // click@30 counts (after view), purchase@20 not
      (3L, 0L, 0L, 0L),
      (4L, 1L, 1L, 0L)))
  }

  test("cohortRetention: cohort = first activity day, distinct users " +
      "per (cohort, offset)") {
    def d(s: String) = Date.valueOf(s)
    val ev = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-01")), // same day dedup
      (1L, d("2024-01-03")),
      (2L, d("2024-01-01")), (2L, d("2024-01-02")),
      (3L, d("2024-01-02"))
    ).toDF("u", "day")
    val out = Analytics.cohortRetention(ev, "u", col("day"))
      .orderBy("cohort_d", "offset_days")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 2L), // users 1,2 on day 0
      ("2024-01-01", 1L, 1L), // user 2 back on day 1
      ("2024-01-01", 2L, 1L), // user 1 back on day 2
      ("2024-01-02", 0L, 1L))) // user 3's cohort
  }

  test("gapFillDaily: dense spine per key, forward fill, leading nulls " +
      "stay null, is_gap marks ONLY synthesized days") {
    def d(s: String) = Date.valueOf(s)
    val daily = Seq(
      ("a", d("2024-01-01"), Some(10L)),
      ("a", d("2024-01-04"), Some(40L)),
      ("b", d("2024-01-02"), None), // observed day with null value
      ("b", d("2024-01-03"), Some(7L))
    ).toDF("k", "day", "v")
    val out = Analytics.gapFillDaily(daily, "k", "day", "v")
      .orderBy("k", "day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 10L, false),
      ("a", "2024-01-02", 10L, true),  // filled
      ("a", "2024-01-03", 10L, true),  // filled
      ("a", "2024-01-04", 40L, false),
      // observed-but-null day: NOT a gap; leading null stays unfilled
      ("b", "2024-01-02", -1L, false),
      ("b", "2024-01-03", 7L, false)))
  }

  test("anomalyZScore: integer-exact flag matches float z-score; " +
      "single-row groups never anomalous") {
    // group g: nine 100s and one 1000 — the outlier's |z| is ~2.846
    // (> 2.5), the 100s are ~0.32 (< 2.5)
    val rows = (Seq.fill(9)(100L) :+ 1000L).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) } :+ ((99L, "solo", 5L))
    val out = Analytics.anomalyZScore(rows.toDF("id", "grp", "x"),
        "grp", "x", 2500)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    assert(out.count(_._2) == 1)
    assert(out.find(_._1 == 9L).exists(_._2 == true)) // the 1000
    assert(out.find(_._1 == 99L).exists(_._2 == false)) // solo group
  }

  test("distributionDriftTV: hand-computed TV, absent bins counted, " +
      "self-baseline is zero") {
    // g1: bins 0,0,1,1 (n=4); g2: bins 0,0,0,0 (n=4)
    // baseline: bin0 C=6, bin1 C=2, N=8
    // TV(g1) = 1/2(|2/4-6/8| + |2/4-2/8|) = 1/4; TV(g2) likewise 1/4
    // (bin1 is ABSENT from g2 — its 2/8 must still contribute)
    val rows = Seq(("g1", 0L), ("g1", 0L), ("g1", 1L), ("g1", 1L),
      ("g2", 0L), ("g2", 0L), ("g2", 0L), ("g2", 0L))
      .toDF("grp", "bin")
    val out = Analytics.distributionDriftTV(rows, "grp", "bin")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // floor(250.5) = 250 on the milli grid
    assert(out.toSeq == Seq(("g1", 4L, 250L), ("g2", 4L, 250L)))

    // a lone group IS the baseline: distance exactly zero
    val solo = Analytics.distributionDriftTV(
      rows.filter(col("grp") === "g1"), "grp", "bin").collect()
    assert(solo.map(_.getLong(2)).toSeq == Seq(0L))
  }

  test("distributionDriftTV equals the brute-force densified TV on " +
      "seeded random histograms") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      val nGroups = 2 + rnd.nextInt(5)
      val nBins = 2 + rnd.nextInt(6)
      // skewed sizes + deliberately absent bins per group
      val rows = (0 until nGroups).flatMap { g =>
        (0 until nBins).filter(_ => rnd.nextDouble() > 0.3).flatMap { b =>
          Seq.fill(1 + rnd.nextInt(20))((s"g$g", b.toLong))
        }
      }
      val out = Analytics.distributionDriftTV(
          rows.toDF("grp", "bin"), "grp", "bin")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      // brute force: densify over ALL bins, exact rational arithmetic
      val counts = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .toMap
      val groups = rows.map(_._1).distinct
      val bins = rows.map(_._2).distinct
      val nOf = groups.map(g =>
        g -> rows.count(_._1 == g).toLong).toMap
      val cOf = bins.map(b => b -> rows.count(_._2 == b).toLong).toMap
      val bigN = rows.size.toLong
      val brute = groups.map { g =>
        val s = bins.map { b =>
          val c = counts.getOrElse((g, b), 0L)
          math.abs(c * bigN - cOf(b) * nOf(g))
        }.sum
        g -> (1000L * s + nOf(g) * bigN) / (2L * nOf(g) * bigN)
      }.toMap
      assert(out == brute, s"round $round: $out vs $brute")
    }
  }

  test("winsorize clips to per-group exact histogram quantiles; " +
      "middle rows pass through untouched") {
    // group a: 20 values 1..20 → p05 lands on 1 (cum 1/20 = 5%),
    // p95 on 19 (cum 19/20 = 95%); group b is constant → lo = hi,
    // everything maps to the constant
    val rows = ((1L to 20L).map(v => ("a", v, v)) ++
      Seq(("b", 100L, 7L), ("b", 101L, 7L)))
      .toDF("grp", "id", "score")
    val out = Analytics.winsorize(rows, "grp", "score", 50L, 950L)
      .collect()
    val a = out.filter(_.getString(0) == "a")
      .map(r => r.getLong(2) -> r.getAs[Long]("score_wins")).toMap
    assert(a(1L) == 1L && a(19L) == 19L && a(10L) == 10L)
    assert(a(20L) == 19L, "above-p95 value must clip down to p95")
    val aThr = out.filter(_.getString(0) == "a").head
    assert(aThr.getAs[Long]("lo_thr") == 1L &&
      aThr.getAs[Long]("hi_thr") == 19L)
    val b = out.filter(_.getString(0) == "b")
    assert(b.forall(_.getAs[Long]("score_wins") == 7L))
  }

  test("funnel plan: one exchange, one sort for all three stages") {
    val ev = Seq((1L, 10L, 1L, "view")).toDF("u", "t", "eid", "kind")
    val plan = Analytics.funnel(ev, "u", col("t"), col("eid"),
      col("kind"), Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert(plan.sliding(8).count(_ == "Exchange") <= 2,
      s"expected single data exchange (+1 for tiny agg):\n$plan")
    assert("(?i)\\bSort\\b".r.findAllIn(plan).size <= 1,
      s"windows should share one sort:\n$plan")
  }
}
