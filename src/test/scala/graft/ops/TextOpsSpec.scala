package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Any = {
    val r = Seq(Option(input)).toDF("v").select(c.as("out")).collect().head
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("tokenCount splits on whitespace runs") {
    assert(one(TextOps.tokenCount(col("v")), "a  b\tc\nd") == 4)
    assert(one(TextOps.tokenCount(col("v")), " one ") == 1)
  }

  test("bpeishTokenCount counts word runs + punctuation marks") {
    assert(one(TextOps.bpeishTokenCount(col("v")), "hi, there!") == 4)
  }

  test("stopword / punct / digit counts") {
    assert(one(TextOps.stopwordCount(col("v")), "the cat and the hat") == 3)
    assert(one(TextOps.punctCount(col("v")), "a, b. c!") == 3)
    assert(one(TextOps.digitCount(col("v")), "a1b22") == 3)
  }

  test("detectLanguage: stopword votes with fixed tie order") {
    val c = TextOps.detectLanguage(col("v"))
    assert(one(c, "the cat is in a box") == "en")
    assert(one(c, "der hund ist ein tier und") == "de")
    assert(one(c, "le chat est dans la maison et") == "fr")
    assert(one(c, "el perro es un animal y los gatos") == "es")
    assert(one(c, "你好世界这是中文") == "zh")
    assert(one(c, "xyzzy blorp") == "en") // all-zero tie → en
  }

  test("wordShingles: distinct n-grams, short docs empty") {
    val sh = TextOps.wordShingles(col("v"), 3)
    assert(one(size(sh), "a b c d") == 2) // "a b c", "b c d"
    assert(one(size(sh), "a b") == 0)
    assert(one(size(sh), "x y x y x y") == 2) // dedup: "x y x", "y x y"
  }

  test("normalizedFingerprint ignores case/punct/whitespace") {
    val fp = TextOps.normalizedFingerprint(col("v"))
    assert(one(fp, "Hello, World!") == one(fp, "hello world"))
    assert(one(fp, "hello world") != one(fp, "hello worlds"))
  }

  test("redactPii scrubs emails, SSNs and phones, keeps the rest") {
    val r = TextOps.redactPii(col("v"))
    assert(one(r, "mail a.b+c@ex-1.co.uk now") == "mail <EMAIL> now")
    assert(one(r, "ssn 123-45-6789.") == "ssn <SSN>.")
    assert(one(r, "call 555-867-5309 or 555.867.5309") ==
      "call <PHONE> or <PHONE>")
    assert(one(r, "v1.2.3 and 12-34 stay") == "v1.2.3 and 12-34 stay")
    // every occurrence, not just the first
    assert(one(r, "a@b.com c@d.org") == "<EMAIL> <EMAIL>")
  }

  test("dupSpanFraction: exact fractions under HEAVY duplication (a " +
      "span shared by half the corpus) and for unique docs") {
    import spark.implicits._
    val shared = "w1 w2 w3" // the viral 3-gram, in every even doc
    val docs = (0 until 200).map { i =>
      val text =
        if (i % 2 == 0) s"$shared u${i}a u${i}b" // 3 spans: 1 dup, 2 unique
        else s"x${i}a x${i}b x${i}c x${i}d"      // 2 spans, all unique
      (i.toLong, text)
    }.toDF("id", "text")
    val got = TextOps.dupSpanFraction(docs, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size == 200)
    (0 until 200).foreach { i =>
      if (i % 2 == 0)
        // spans: "w1 w2 w3", "w2 w3 u_a", "w3 u_a u_b" — only the
        // first appears elsewhere
        assert(got(i.toLong) == ((3L, 1L, 333L)), s"doc $i: ${got(i.toLong)}")
      else
        assert(got(i.toLong) == ((2L, 0L, 0L)), s"doc $i: ${got(i.toLong)}")
    }
  }

  test("stripBoilerplate: frequent lines excised per source, rare " +
      "lines kept, boilerplate-free sources untouched") {
    import spark.implicits._
    // srcA: 4 docs sharing a header (100% >= 30%); one doc also has a
    // RARE line (25% < 30% — kept). srcB: 2 docs sharing a line that
    // clears the ratio at tiny support (100% of 2 docs) — the minDocs
    // guard must leave it alone; without the guard it would be
    // shredded (the 2-doc no-template source case).
    // every srcA doc also carries a blank paragraph separator — at
    // 100% doc-frequency it would be "boilerplate" by ratio, but
    // empty lines are excluded from candidacy (stripping them would
    // collapse paragraph structure corpus-wide)
    val docs = Seq(
      (1L, "srcA", "HDR A\nbody one\n\npara two"),
      (2L, "srcA", "HDR A\nbody two\n\npara two b"),
      (3L, "srcA", "HDR A\nRARE\nbody three\n\npara three"),
      (4L, "srcA", "HDR A\nbody four\n\npara four"),
      (5L, "srcB", "shared small\nbody five"),
      (6L, "srcB", "shared small\nbody six")
    ).toDF("doc_id", "source", "text")
    val got = TextOps.stripBoilerplate(docs, "doc_id", "source",
        "text", minRatioMilli = 300, minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "body one\n\npara two")
    assert(got(2L) == "body two\n\npara two b")
    assert(got(3L) == "RARE\nbody three\n\npara three")
    assert(got(4L) == "body four\n\npara four")
    assert(got(5L) == "shared small\nbody five")
    assert(got(6L) == "shared small\nbody six")
  }

  test("stripBoilerplate: the minimum-support guard is ON by default " +
      "— a 2-doc source is untouched, a 3-doc template is stripped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tiny", "only shared line\nbody one"),
      (2L, "tiny", "only shared line\nbody two"),
      (3L, "tpl", "TPL HDR\nalpha"),
      (4L, "tpl", "TPL HDR\nbeta"),
      (5L, "tpl", "TPL HDR\ngamma")
    ).toDF("doc_id", "source", "text")
    val got = TextOps.stripBoilerplate(docs, "doc_id", "source",
        "text", minRatioMilli = 500) // defaults: minDocs = 3
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "only shared line\nbody one") // guarded
    assert(got(2L) == "only shared line\nbody two")
    assert(got(3L) == "alpha") // 3 docs: template stripped
    assert(got(4L) == "beta")
    assert(got(5L) == "gamma")
  }

  test("exciseDupSpans: unique docs round-trip byte-identical; a " +
      "planted shared paragraph survives in exactly one document") {
    import spark.implicits._
    // long enough that CDC yields interior chunks ≥ minLen shared
    // byte-identically across carriers regardless of surrounding text
    val para = (0 until 40).map(i => s"shared$i").mkString(" ")
    val docs = (0 until 30).map { i =>
      val text =
        if (i % 3 == 0) s"head${i}x $para tail${i}y"
        else (0 until 30).map(j => s"u${i}w$j").mkString(" ")
      (i.toLong, text)
    }.toDF("id", "text")
    val out = TextOps.exciseDupSpans(docs, "id", "text")
    val got = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 30)
    // unique docs: nothing excised, reassembly is byte-identical
    (0 until 30).filter(_ % 3 != 0).foreach { i =>
      val (nc, nk, clean) = got(i.toLong)
      assert(nc == nk && clean == orig(i.toLong), s"doc $i")
    }
    // carriers: doc 0 (global min id) keeps everything; later carriers
    // lose the paragraph's interior chunks but keep their unique rims
    val (c0, k0, clean0) = got(0L)
    assert(c0 == k0 && clean0 == orig(0L))
    (3 until 30 by 3).foreach { i =>
      val (nc, nk, clean) = got(i.toLong)
      assert(nk < nc, s"doc $i excised nothing")
      assert(clean.length < orig(i.toLong).length)
      assert(clean.startsWith(s"head${i}x") && clean.endsWith(s"tail${i}y"))
    }
    // global guarantee: a mid-paragraph token survives in exactly ONE
    // document (interior chunks are byte-shared across carriers, so
    // every non-canonical copy is excised)
    assert(got.values.count(_._3.contains("shared20")) == 1)
  }

  test("chunkStarts/chunkAt: full coverage, overlap, short tail") {
    val toks = TextOps.tokens(col("v"))
    val starts = TextOps.chunkStarts(toks, 3)
    val text = "t1 t2 t3 t4 t5 t6 t7" // 7 tokens, window 4, stride 3
    assert(one(starts, text) == Seq(1, 4, 7))
    assert(one(TextOps.chunkAt(toks, lit(4), 4), text) == "t4 t5 t6 t7")
    assert(one(TextOps.chunkAt(toks, lit(7), 4), text) == "t7") // short tail
    assert(one(starts, "solo") == Seq(1))
  }

  test("stripHtml: tags and comments removed, entities decoded AFTER " +
      "(decoded markup survives), double-encoded stays single-decoded, " +
      "whitespace squeezed") {
    val c = TextOps.stripHtml(col("v"))
    assert(one(c, "<p class=\"x\">hello   <b>world</b></p>")
      == "hello world")
    assert(one(c, "a<!-- hidden -->b") == "a b")
    // entities decode after tag strip: <raw> is text, not markup
    assert(one(c, "say &lt;raw&gt; &amp; &quot;hi&quot; &#39;s&#39;")
      == "say <raw> & \"hi\" 's'")
    // double-encoded decodes exactly once
    assert(one(c, "&amp;amp;") == "&amp;")
    assert(one(c, "  \n\t spaced \r\n out ") == "spaced out")
  }

  test("bpeTrain: hand-worked merges — frequency weighting, lexicographic " +
      "tie-break, early exhaustion") {
    val docs = Seq("the then", "the").toDF("text")
    val res = TextOps.bpeTrain(docs, "text", rounds = 5)
    // round 1: (h,e)=3 ties (t,h)=3 -> "h e" < "t h" wins; round 2:
    // (t,he)=3; round 3: (the,n)=1; round 4: no pairs left -> stop.
    assert(res.merges == Seq(
      TextOps.BpeMerge(1, "h", "e", "he", 3L),
      TextOps.BpeMerge(2, "t", "he", "the", 3L),
      TextOps.BpeMerge(3, "the", "n", "then", 1L)))
    val syms = res.vocab.orderBy("word").collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    assert(syms == Seq("the" -> " the ", "then" -> " then "))
    res.release()
  }

  test("bpeTrain: merge application is greedy leftmost non-overlapping " +
      "(aaa counts the pair twice, merges once)") {
    val docs = Seq("aaa").toDF("text")
    val res = TextOps.bpeTrain(docs, "text", rounds = 2)
    // " a a a " has TWO (a,a) occurrences; the replace consumes the
    // leftmost only: " aa a " — exactly greedy BPE application.
    assert(res.merges == Seq(
      TextOps.BpeMerge(1, "a", "a", "aa", 2L),
      TextOps.BpeMerge(2, "aa", "a", "aaa", 1L)))
    res.release()
  }

  test("bpeTrain: pre-tokenization folds case and strips non-letters") {
    val docs = Seq("The the! THE", "ab AB").toDF("text")
    val res = TextOps.bpeTrain(docs, "text", rounds = 1)
    // the*3 contributes (t,h)=(h,e)=3; ab*2 contributes (a,b)=2;
    // tie (h,e) vs (t,h) -> "h e" first.
    assert(res.merges.head == TextOps.BpeMerge(1, "h", "e", "he", 3L))
    res.release()
  }

  test("sharedPrefixTurns: hand case — shared system prompt, one " +
      "re-rolled continuation, one full duplicate, one unique conv") {
    val convs = Seq(
      (1L, Seq("sys", "ask A", "ans A1")),         // shares 2 with 2
      (2L, Seq("sys", "ask A", "ans A2")),         // shares 2 with 1
      (3L, Seq("sys", "ask B", "ans B", "more")),  // shares 1 (sys)
      (4L, Seq("sys", "ask C")),                   // shares 1 (sys)
      (5L, Seq("dup", "dup2")),                    // full duplicate of 6
      (6L, Seq("dup", "dup2")),
      (7L, Seq("lonely"))                          // shares nothing
    ).toDF("id", "turns")
    val got = TextOps.sharedPrefixTurns(convs, "id", "turns")
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, 3L), (2L, 3L, 2L, 3L), (3L, 4L, 1L, 2L),
      (4L, 2L, 1L, 2L), (5L, 2L, 2L, 3L), (6L, 2L, 2L, 3L),
      (7L, 1L, 0L, 1L)))
  }

  test("sharedPrefixAgainstIndex: stored occurrences count once, " +
      "batch-internal sharing needs two; index merge is additive") {
    val stored = Seq(
      (1L, Seq("sys", "ask A", "ans A")),
      (2L, Seq("sys", "ask B"))).toDF("id", "turns")
    val idx = TextOps.prefixIndex(stored, "id", "turns")
    val batch = Seq(
      (10L, Seq("sys", "ask A", "ans A")),   // full replay of stored 1
      (11L, Seq("sys", "ask C")),            // shares 1 turn w/ store
      (12L, Seq("own", "twin")),             // batch-internal pair...
      (13L, Seq("own", "twin")),             // ...shares 2 within batch
      (14L, Seq("alone"))                    // nothing anywhere
    ).toDF("id", "turns")
    val got = TextOps
      .sharedPrefixAgainstIndex(batch, "id", "turns", idx)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((10L, 3L), (11L, 1L), (12L, 2L), (13L, 2L),
      (14L, 0L)))
    // additivity: index over (stored ∪ batch) == fold of the two
    // indexes re-aggregated on (p, fp)
    val all = stored.unionByName(batch)
    val whole = TextOps.prefixIndex(all, "id", "turns")
      .orderBy("p", "fp").collect().map(_.toSeq).toSeq
    val folded = idx
      .unionByName(TextOps.prefixIndex(batch, "id", "turns"))
      .groupBy("p", "fp")
      .agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .orderBy("p", "fp").collect().map(_.toSeq).toSeq
    assert(whole == folded)
  }

  test("sharedPrefixTurns conventions (r14 advice): null/empty-turns " +
      "conversations still emit a row; null turn elements don't " +
      "collide with their absence") {
    val convs = Seq(
      (1L, Seq("a", null)),   // null SECOND turn...
      (2L, Seq(null, "a")),   // ...must not collide with null FIRST
      (3L, Seq.empty[String]),
      (4L, null)              // null turns array
    ).toDF("id", "turns")
    val got = TextOps.sharedPrefixTurns(convs, "id", "turns")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // pre-fix, concat_ws skipped nulls so 1 and 2 collided at p=2 (both
    // md5("a")) and 3/4 vanished from the output entirely
    assert(got.toSeq == Seq(
      (1L, 2L, 0L, 1L), (2L, 2L, 0L, 1L),
      (3L, 0L, 0L, 1L), (4L, 0L, 0L, 1L)))
    // same conventions through the index path: the placeholder rows
    // stay out of the stored index, the empty convs stay in the output
    val idx = TextOps.prefixIndex(convs, "id", "turns")
    assert(idx.filter($"p" < 1L).count() == 0L)
    val batch = Seq(
      (10L, Seq("a", null)),  // replay of stored 1 -> shares 2
      (11L, Seq.empty[String]),
      (12L, null)
    ).toDF("id", "turns")
    val viaIdx = TextOps
      .sharedPrefixAgainstIndex(batch, "id", "turns", idx)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(viaIdx == Seq((10L, 2L), (11L, 0L), (12L, 0L)))
  }

  test("sharedPrefixTurns fuzz: equals the brute-force pairwise " +
      "longest-common-prefix reference on random conversation sets") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 5) {
      val convs = (1L to 40L).map { id =>
        val n = 1 + rnd.nextInt(4)
        (id, Seq.tabulate(n)(i => s"t${rnd.nextInt(3)}_$i"))
      }
      val expect = convs.map { case (id, ts) =>
        val best = convs.filter(_._1 != id).map { case (_, os) =>
          ts.zip(os).takeWhile { case (a, b) => a == b }.length
        }.maxOption.getOrElse(0)
        id -> best.toLong
      }.toMap
      val got = TextOps
        .sharedPrefixTurns(convs.toDF("id", "turns"), "id", "turns")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expect, s"trial $trial diverged from brute force")
    }
  }
}
