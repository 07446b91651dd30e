package graft.ops

import graft.SparkSpec

/** Gopher repetition battery: hand-computed anchors plus a fuzz sweep
  * against a straight-line Scala reference (groupBy counting — fully
  * independent of the sorted run-length walk under test). */
class RepetitionSignalsSpec extends SparkSpec {
  import spark.implicits._

  private case class Ref(nTokens: Long, top2Gram: Option[String],
                         top2: Long, top3: Long, dup5: Long, ok: Int)

  /** Straight-line reference of the documented semantics. */
  private def reference(text: String): Ref = {
    val toks = text.trim.split("[ \t\n\r\f]+", -1).toSeq
    val wchars = toks.map(_.length.toLong).sum
    def grams(n: Int): Seq[String] =
      if (toks.size < n) Seq.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    def top(n: Int): Option[(String, Long)] = {
      val cnt = grams(n).groupBy(identity).map { case (g, o) =>
        (g, o.size.toLong) }
      if (cnt.isEmpty) None
      else Some(cnt.toSeq.minBy { case (g, c) => (-c, g) })
    }
    def frac(n: Int): Long = top(n) match {
      case Some((g, c)) if wchars > 0 =>
        1000L * (c * (g.length - (n - 1))) / wchars
      case _ => 0L
    }
    val dup5 = {
      val g = grams(5)
      if (g.isEmpty) 0L
      else {
        val cnt = g.groupBy(identity).map(_._2.size)
        val dupPos = g.size.toLong - cnt.count(_ == 1)
        1000L * dupPos / g.size
      }
    }
    val t2 = frac(2); val t3 = frac(3)
    Ref(toks.size.toLong, top(2).map(_._1), t2, t3, dup5,
      if (t2 <= 200 && t3 <= 180 && dup5 <= 150) 1 else 0)
  }

  private def run(texts: Seq[String]): Seq[Ref] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextOps.repetitionSignals(df, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq.map { r =>
        Ref(r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getString(2)),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))
      }
  }

  test("hand anchors: stutter, doubled text, short and unique docs") {
    // "a b a b a": 2-grams {a b:2, b a:2} -> top "a b" (lex tie-break),
    // covered chars 2*2=4 of 5 -> 800; 3-grams {a b a:2, b a b:1} ->
    // 2*3=6 of 5 -> 1200 (overlap exceeds 1000 by design); one 5-gram,
    // singleton -> dup5 0. Flag trips on top2/top3.
    val stutter = run(Seq("a b a b a")).head
    assert(stutter == Ref(5, Some("a b"), 800, 1200, 0, 0))

    // doubled 6-token doc: every 5-gram in the second half repeats...
    // tokens = w1..w6 w1..w6 (12), 5-gram positions 8; grams at
    // positions 1..3 == 7..9 wait — verify against the reference.
    val doubled = "u v w x y z u v w x y z"
    assert(run(Seq(doubled)).head == reference(doubled))

    // fewer than 2 tokens: null gram, all zeros, flag ok
    assert(run(Seq("hello")).head == Ref(1, None, 0, 0, 0, 1))

    // all-unique tokens: top counts 1, dup5 0. A 10-token doc's
    // singleton top 3-gram still covers 3/10 of its chars (300‰ >
    // the 180‰ cutoff) — the Gopher thresholds presume real-length
    // docs, and the flag correctly rejects this stub.
    val uniq = run(Seq("q w e r t y u i o p")).head
    assert(uniq.top2Gram == Some("e r")) // lexicographically smallest
    assert(uniq.top2 == 200 && uniq.top3 == 300)
    assert(uniq.dup5 == 0 && uniq.ok == 0)
  }

  test("fuzz: 300 random docs equal the straight-line reference") {
    val rnd = new scala.util.Random(0x60fe4L)
    val vocab = Vector("a", "b", "c", "ab", "xyz", "q1", "t")
    val texts = (0 until 300).map { _ =>
      val n = rnd.nextInt(40)
      if (n == 0) "x"
      else {
        val base = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
        // half the docs get a planted repeat of a random slice
        val toks = if (rnd.nextBoolean() && n >= 4) {
          val s = rnd.nextInt(n - 2)
          val l = 2 + rnd.nextInt(n - s - 2 max 1)
          base ++ base.slice(s, (s + l) min n)
        } else base
        toks.mkString(" ")
      }
    }
    val got = run(texts)
    texts.zip(got).zipWithIndex.foreach { case ((t, g), i) =>
      assert(g == reference(t), s"doc $i: '$t'")
    }
  }
}
