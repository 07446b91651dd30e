package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-curation operator semantics on hand-checkable fixtures. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("topTermsPerDoc ranks rare terms above common ones") {
    val docs = Seq(
      (1L, "apple banana banana"),   // banana tf=2 but df=2; apple df=1
      (2L, "banana cherry")
    ).toDF("doc_id", "text")
    val out = Corpus.topTermsPerDoc(docs, "doc_id", "text", k = 2)
      .orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(5)))
    // doc 1: banana 2/2 → 1000, apple 1/1 → 1000; tie → term asc
    assert(out(0) == (1L, 1, "apple", 1000L))
    assert(out(1) == (1L, 2, "banana", 1000L))
    // doc 2: cherry 1/1 → 1000 beats banana 1/2 → 500
    assert(out(2) == (2L, 1, "cherry", 1000L))
    assert(out(3) == (2L, 2, "banana", 500L))
  }

  test("stratifiedHashSample keeps k per group; ungrown strata keep " +
      "their exact sample (bounded churn)") {
    val base = (1L to 50L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    val small = base.toDF("doc_id", "lang")
    val grown = (base ++ (51L to 80L).map(i => (i, "a")))
      .toDF("doc_id", "lang")
    def sample(df: org.apache.spark.sql.DataFrame) =
      Corpus.stratifiedHashSample(df, Seq("lang"), "doc_id", k = 5)
        .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val s1 = sample(small)
    assert(s1.count(_._1 == "a") == 5 && s1.count(_._1 == "b") == 5)
    // growth adds candidates but cannot evict an id whose md5 rank
    // still clears the cut — group b unchanged entirely
    val s2 = sample(grown)
    assert(s2.filter(_._1 == "b") == s1.filter(_._1 == "b"))
  }

  test("prioritySample favors heavy weights and is growth-consistent " +
      "(survivors of growth were already sampled)") {
    val light = (1L to 100L).map(i => (i, 1L))
    val heavy = (101L to 200L).map(i => (i, 100L))
    val df = (light ++ heavy).toDF("doc_id", "w")
    val picked = Corpus.prioritySample(df, "doc_id", "w", k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(picked.size == 50)
    // q = w/u: a weight-1 doc outranks a weight-100 doc only when its
    // uniform is ~100x smaller — expect the sample to be almost
    // entirely heavy docs
    assert(picked.count(_ > 100L) >= 45,
      s"only ${picked.count(_ > 100L)} heavy docs of 50")
    // growth consistency: priorities never change, so new docs can
    // evict but never promote — survivors were in the smaller sample
    val grown = (light ++ heavy ++ (201L to 260L).map(i => (i, 100L)))
      .toDF("doc_id", "w")
    val picked2 = Corpus.prioritySample(grown, "doc_id", "w", k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(picked2.filter(_ <= 200L).subsetOf(picked))
  }

  test("packByTokenBudget fills bins greedily and exactly") {
    val docs = Seq(
      (1L, 0L, 400L), (2L, 0L, 500L), (3L, 0L, 300L), (4L, 0L, 900L),
      (5L, 1L, 1200L), (6L, 1L, 10L)
    ).toDF("doc_id", "shard", "n_tokens")
    val out = Corpus.packByTokenBudget(docs, "shard", "doc_id",
        "n_tokens", budget = 1000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    // shard 0 cum-before: 0, 400, 900, 1200 → bins 0,0,0,1
    // shard 1 cum-before: 0, 1200          → bins 0,1
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L),
      (5L, 0L), (6L, 1L)))
  }

  test("concatSplitWindows: hand-computed spans, boundary-exact") {
    val docs = Seq(
      (1L, 0L, 3L),   // off 0:  [0,3) in win 0
      (2L, 0L, 5L),   // off 3:  [3,8) in win 0
      (3L, 0L, 10L),  // off 8:  boundary-aligned; win 1 [0,8), win 2 [8,10)
      (4L, 0L, 6L),   // off 18: tokens 18..23 sit inside win 2 alone
      (5L, 1L, 20L),  // off 0:  wins 0,1,2 — multi-window doc
      (6L, 1L, 0L)    // zero tokens: dropped
    ).toDF("doc_id", "shard", "n_tokens")
    val out = Corpus.concatSplitWindows(docs, "shard", "doc_id",
        "n_tokens", window = 8L)
      .select("doc_id", "win", "a_tok", "b_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 3L), (2L, 0L, 0L, 5L),
      (3L, 1L, 0L, 8L), (3L, 2L, 8L, 10L), // off 8 = exact boundary
      (4L, 2L, 0L, 6L),                    // off 18, 18+6=24 exact end
      (5L, 0L, 0L, 8L), (5L, 1L, 8L, 16L), (5L, 2L, 16L, 20L)))
  }

  test("concatSplitWindows fuzz: spans partition each doc; every " +
      "window but a shard's last holds exactly `window` tokens") {
    val rnd = new scala.util.Random(42L)
    for (round <- 0 until 25) {
      val wsz = 1L + rnd.nextInt(64)
      val docs = (0L until (5L + rnd.nextInt(40))).map { id =>
        (id, (id % (1 + rnd.nextInt(4))), rnd.nextInt(3 * wsz.toInt).toLong)
      }
      val out = Corpus.concatSplitWindows(
          docs.toDF("doc_id", "shard", "n_tokens"),
          "shard", "doc_id", "n_tokens", window = wsz)
        .select("doc_id", "shard", "n_tokens", "off", "win", "a_tok",
          "b_tok")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      // straight-line reference: running offset per shard in doc order
      val expect = docs.filter(_._3 > 0).groupBy(_._2).toSeq.flatMap {
        case (_, ds) =>
          var off = 0L
          ds.sortBy(_._1).flatMap { case (id, sh, n) =>
            val rows = (off / wsz to (off + n - 1) / wsz).map { w =>
              (id, sh, n, off, w, math.max(0L, w * wsz - off),
                math.min(n, (w + 1) * wsz - off))
            }
            off += n
            rows
          }
      }.toSet
      assert(out.toSet == expect, s"round $round window $wsz")
      // invariant 1: spans partition [0, n_tokens) per doc
      out.groupBy(_._1).foreach { case (id, rows) =>
        val spans = rows.sortBy(_._5).map(r => (r._6, r._7))
        assert(spans.head._1 == 0L && spans.last._2 == rows.head._3)
        spans.sliding(2).foreach { pair =>
          if (pair.length == 2)
            assert(pair(0)._2 == pair(1)._1, s"doc $id gap")
        }
      }
      // invariant 2: full windows carry exactly wsz tokens
      out.groupBy(r => (r._2, r._5)).foreach { case ((sh, w), rows) =>
        val filled = rows.map(r => r._7 - r._6).sum
        val lastWin = out.filter(_._2 == sh).map(_._5).max
        if (w < lastWin) assert(filled == wsz, s"shard $sh win $w")
        else assert(filled <= wsz)
      }
    }
  }

  test("deterministicSplit: stable per-key, ~proportional, validated") {
    val ids = spark.range(2000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Corpus.deterministicSplit(ids, Seq("id"), splits)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1500 && counts("train") < 1700,
      s"train fraction off: $counts")
    // growth stability: the same id keeps its split in a larger corpus
    val grown = Corpus.deterministicSplit(
      spark.range(4000).toDF("id"), Seq("id"), splits)
    val before = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    grown.filter(col("id") < 2000).collect().foreach { r =>
      assert(before(r.getLong(0)) == r.getString(1))
    }
    intercept[IllegalArgumentException] {
      Corpus.deterministicSplit(ids, Seq("id"), Seq("all" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Corpus.deterministicSplit(ids, Seq("id"),
        Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("deterministicSplit sends NULL keys to the last split, like " +
      "the SQL twin's md5(NULL) fallthrough") {
    import org.apache.spark.sql.functions.{col, when}
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val df = spark.range(100)
      .select(when(col("id") < 10, null).otherwise(col("id")).as("id"))
    val out = Corpus.deterministicSplit(df, Seq("id"), splits)
    assert(out.filter(col("id").isNull)
      .select("split").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("test"))
  }

  test("kmvOverlap: identical strata estimate 1000, disjoint 0, " +
      "partial lands near truth") {
    import org.apache.spark.sql.functions.col
    val rows =
      (0 until 100).map(i => ("a", s"item$i")) ++     // a = 0..99
      (0 until 100).map(i => ("b", s"item$i")) ++     // b identical to a
      (50 until 150).map(i => ("c", s"item$i")) ++    // c: J(a,c)=50/150
      (500 until 600).map(i => ("d", s"item$i"))      // d disjoint from a
    val out = Corpus.kmvOverlap(rows.toDF("src", "item"),
        "src", "item", k = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(out(("a", "b")) == 1000L, "identical sets must estimate 1000")
    assert(out(("a", "d")) == 0L, "disjoint sets must estimate 0")
    val est = out(("a", "c")) // truth 333; KMV with k=64 is coarse
    assert(est > 150L && est < 550L,
      s"partial-overlap estimate $est too far from 333")
  }

  test("isqrt is the exact floor square root near perfect squares") {
    import org.apache.spark.sql.functions.col
    // n², n²−1, n²+1 are the cases a naive floor(sqrt) can miss
    val ns = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 10L, 99L, 100L, 101L,
      (1L << 26) * (1L << 26) - 1, (1L << 26) * (1L << 26))
    val out = ns.toDF("n")
      .select(col("n"), Corpus.isqrt(col("n")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      val s = out(n)
      assert(s * s <= n && (s + 1) * (s + 1) > n,
        s"isqrt($n) = $s is not the floor sqrt")
    }
  }

  test("costBudgetCap admits at most budget-plus-one-straddler per " +
      "stratum and keeps the md5-order prefix") {
    import org.apache.spark.sql.functions.{col, max, sum}
    val df = Seq.tabulate(40)(i =>
      (i.toLong, s"s${i % 2}", 100L + i)).toDF("id", "src", "cost")
    val out = Corpus.costBudgetCap(df, "src", "id", "cost", budget = 500L)
    // spent-before-last-admitted < budget for every stratum
    val spent = out.groupBy("src")
      .agg(max(col("cum_cost")).as("cum"), sum(col("cost")).as("tot"))
      .collect()
    assert(spent.nonEmpty)
    spent.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "cum must equal sum of admitted")
      // dropping the straddler must land under budget
      val under = out.filter(col("src") === r.getString(0))
        .orderBy(col("cum_cost").desc).collect()
      assert(under.length >= 1)
      val last = under.head
      assert(last.getAs[Long]("cum_cost") -
        last.getAs[Long]("cost") < 500L)
    }
  }

  test("temperatureRebalance quotas sum to exactly totalK and " +
      "upsample the tail vs proportional") {
    import org.apache.spark.sql.functions.col
    // 360 "en", 60 "fr": proportional 200-slot shares are ~171/29;
    // √-weights 18/7 → quotas 144/56 — the tail is upsampled (both
    // strata hold at least their quota, so availability never caps).
    val df = (0 until 360).map(i => (i.toLong, "en")) ++
      (1000 until 1060).map(i => (i.toLong, "fr"))
    val out = Corpus.temperatureRebalance(
      df.toDF("id", "lang"), "lang", "id", totalK = 200)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.sum == 200L)
    assert(byLang("fr") == 56L && byLang("en") == 144L)
  }

  test("domainRelevance scores target-like docs above off-domain docs " +
      "and is mean-of-buckets exact") {
    // target vocabulary {alpha beta}; off-domain {gamma delta}.
    // Docs 1-2 are the target; doc 3 mirrors the target vocabulary,
    // doc 4 is pure off-domain, doc 5 mixes both.
    val docs = Seq(
      (1L, true, "alpha beta alpha"),
      (2L, true, "beta alpha beta"),
      (3L, false, "alpha beta beta"),
      (4L, false, "gamma delta gamma"),
      (5L, false, "alpha gamma")
    ).toDF("doc_id", "is_t", "text")
    val out = Corpus.domainRelevance(docs, "doc_id", "text",
      col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // every alpha/beta token has corpus count split target/corpus =
    // 6 target hits of 15 total tokens overall; a target-vocab doc
    // scores strictly above the off-domain doc, and doc 4 scores 0
    // (its buckets have zero target mass)
    assert(out(4L)._2 == 0L)
    assert(out(3L)._2 > out(5L)._2 && out(5L)._2 > out(4L)._2)
    assert(out(1L)._2 == out(2L)._2, "same-vocab docs score equal")
    assert(out(1L)._1 == 3L && out(5L)._1 == 2L, "n_toks exact")
  }

  test("domainRelevance plan: scoring joins the broadcast bucket " +
      "table, never sort-merge; quantileCutoff windows run over the " +
      "histogram aggregate, not raw rows") {
    import org.apache.spark.sql.catalyst.plans.logical
    val docs = Seq((1L, true, "a b"), (2L, false, "c d"))
      .toDF("doc_id", "is_t", "text")
    val dr = Corpus.domainRelevance(docs, "doc_id", "text",
      col("is_t"), 64)
    dr.collect() // finalize the AQE plan before inspecting it
    val drPlan = dr.queryExecution.executedPlan.toString
    assert(drPlan.contains("BroadcastHashJoin") &&
      !drPlan.contains("SortMergeJoin"),
      s"relevance table must broadcast onto the scoring pass:\n$drPlan")
    // the quantile windows must consume the (strata, score) aggregate
    // — every logical Window sits over an Aggregate subtree, so the
    // sorted exchange moves bins, not data rows
    val qcLogical = Corpus.quantileCutoff(
      Seq(("a", 1L, 5L)).toDF("source", "doc_id", "score_milli"),
      "source", "score_milli", 250L).queryExecution.optimizedPlan
    val wins = qcLogical.collect { case w: logical.Window => w }
    assert(wins.nonEmpty && wins.forall(w =>
        w.child.collectFirst { case a: logical.Aggregate => a }.nonEmpty),
      s"quantile windows must run over the histogram:\n$qcLogical")
  }

  test("epochRepeat fills toward the target, caps repeats, and gives " +
      "the remainder to the md5-prefix") {
    // a: 4 docs, target 10, cap 3 → full=2, rem=2: two docs get a
    // 3rd epoch → exactly 10 rows. b: 1 doc, target 10 → cap binds:
    // 3 rows, underfilled. c: 20 docs → full=0, rem=10: 10 singles.
    val df = ((1L to 4L).map(i => (i, "a")) ++ Seq((100L, "b")) ++
      (200L until 220L).map(i => (i, "c"))).toDF("doc_id", "lang")
    val out = Corpus.epochRepeat(df, "lang", "doc_id",
      targetPerStratum = 10L, maxEpochs = 3)
      .select("lang", "doc_id", "epoch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byLang = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLang == Map("a" -> 10, "b" -> 3, "c" -> 10))
    // every a-doc appears at least twice (full epochs), exactly two
    // of them three times
    val aCounts = out.filter(_._1 == "a").groupBy(_._2)
      .view.mapValues(_.length).toMap
    assert(aCounts.values.forall(c => c == 2 || c == 3))
    assert(aCounts.values.count(_ == 3) == 2)
    // epochs are dense 1..k per doc
    assert(out.filter(t => t._1 == "b").map(_._3).sorted.toSeq ==
      Seq(1, 2, 3))
  }

  test("quantileCutoff keeps rows at/above each stratum's exact " +
      "histogram quantile, independently per stratum") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 20L), ("a", 4L, 30L),
      ("a", 5L, 40L), ("a", 6L, 40L), ("a", 7L, 50L), ("a", 8L, 60L),
      ("b", 9L, 5L), ("b", 10L, 500L)
    ).toDF("source", "doc_id", "score_milli")
    val out = Corpus.quantileCutoff(df, "source", "score_milli",
      pctMilli = 500L).collect()
    // stratum a: n=8, median threshold lands on bin 30 (cum 4 of 8);
    // the whole threshold bin and everything above survives — ties at
    // the cut are kept together, never split
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getLong(1)).sorted.toSeq == Seq(4L, 5L, 6L, 7L, 8L))
    assert(a.forall(_.getAs[Long]("thr_milli") == 30L))
    // stratum b: n=2, cum(5)=1 → 1000 ≥ 500·2 → thr=5: both kept —
    // a's threshold never leaks into b
    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 2 && b.forall(_.getAs[Long]("thr_milli") == 5L))
  }

  test("releaseDiff: every id classified into exactly one fate by " +
      "content hash; null text compares equal to null text") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c CHANGED"), (5L, "new"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Corpus.releaseDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "unchanged", 5L -> "added"))
    // partition property: each input id appears exactly once
    assert(out.size == 5)
  }
}
