package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reference-fit LM surprisal ([[Ngram.refLmSurprisal]]) pinned two
  * ways: a hand-computed toy corpus, and a 60-corpus seeded fuzz
  * against an independent straight-line Scala reference (plain Maps
  * and Long divisions — no Spark, no shared code with the operator).
  * The tercile bucketing is checked against the row_number formula it
  * replaces plus structural invariants (monotone along score order,
  * sizes differ by at most one). */
class RefLmSpec extends SparkSpec {

  private def toks(s: String): Array[String] =
    s.trim.toLowerCase.split("[ \t\n\r\f]+").filter(_.nonEmpty)

  /** Straight-line reference: (id -> (nBigrams, nUnseen, surprisal)). */
  private def refImpl(docs: Seq[(Long, String, Boolean)])
      : Map[Long, (Long, Long, Long)] = {
    val refToks = docs.collect { case (_, t, true) => toks(t) }
      .filter(_.length >= 2)
    val refBigrams = refToks.flatMap(ts => ts.init.zip(ts.tail))
    val c2 = refBigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = refBigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = refToks.flatten.distinct.size.toLong
    docs.flatMap { case (id, t, _) =>
      val ts = toks(t)
      if (ts.length < 2) None
      else {
        val bgs = ts.init.zip(ts.tail)
        val ips = bgs.map { bg =>
          (1000L * (c1.getOrElse(bg._1, 0L) + v)) / (c2.getOrElse(bg, 0L) + 1L)
        }
        val unseen = bgs.count(bg => !c2.contains(bg)).toLong
        Some(id -> ((bgs.length.toLong, unseen, ips.sum / bgs.length)))
      }
    }.toMap
  }

  test("hand-computed toy corpus: smoothing, OOV, short-doc exclusion") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b", "en"),  // ref: bigrams ab, ba, ab
      (2L, "a  B", "en"),     // ref: bigram ab (multi-space, case)
      (3L, "b z", "fr"),      // target only: bz unseen, prev b seen
      (4L, "z q", "fr"),      // target only: both words out-of-model
      (5L, "solo", "en"),     // 1 token -> excluded everywhere
      (6L, "", "fr")          // no tokens -> excluded
    ).toDF("doc_id", "text", "lang")
    val got = Ngram.refLmSurprisal(docs, col("lang") === "en",
        "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // ref model: c2(ab)=3 c2(ba)=1; c1(a)=3 c1(b)=1; V=2 (a, b)
    // doc1: ip(ab)=(1000*(3+2))div(3+1)=1250, ip(ba)=(1000*(1+2))div 2=1500
    //       -> (1250+1500+1250) div 3 = 1333, unseen 0
    // doc2: ip(ab)=1250 -> 1250, unseen 0
    // doc3: ip(bz)=(1000*(1+2))div 1=3000 -> unseen 1
    // doc4: ip(zq)=(1000*(0+2))div 1=2000 -> unseen 1
    assert(got == Seq((1L, 3L, 0L, 1333L), (2L, 1L, 0L, 1250L),
      (3L, 1L, 1L, 3000L), (4L, 1L, 1L, 2000L)))
    assert(got == refImpl(Seq(
      (1L, "a b a b", true), (2L, "a  B", true), (3L, "b z", false),
      (4L, "z q", false), (5L, "solo", true), (6L, "", false)))
      .toSeq.sortBy(_._1).map { case (id, (n, u, s)) => (id, n, u, s) })
  }

  test("fuzz: 60 seeded random corpora match the straight-line " +
      "reference exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val vocab = ('a' to 't').map(_.toString) ++
      Seq("alpha", "beta", "gamma", "delta")
    for (round <- 0 until 60) {
      val nDocs = 3 + rnd.nextInt(20)
      val docs = (0L until nDocs.toLong).map { id =>
        val n = rnd.nextInt(14) // 0..13 tokens: exercises exclusion
        val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        // random whitespace separators exercise the split class
        val seps = Seq(" ", "  ", "\t", "\n", " \r ")
        val text = words.map(w =>
          if (rnd.nextBoolean()) w.toUpperCase else w)
          .mkString(seps(rnd.nextInt(seps.size)))
        (id, text, rnd.nextBoolean())
      }
      val expect = refImpl(docs)
      val got = Ngram.refLmSurprisal(
          docs.toDF("doc_id", "text", "is_ref"), col("is_ref"),
          "doc_id", "text")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == expect, s"round $round corpus: $docs")
    }
  }

  test("tercile buckets match the row_number formula and are balanced") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val vocab = ('a' to 'j').map(_.toString)
    val docs = (0L until 40L).map { id =>
      val words = Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
      (id, words.mkString(" "), rnd.nextBoolean())
    }
    val scored = Ngram.refLmSurprisal(
      docs.toDF("doc_id", "text", "is_ref"), col("is_ref"),
      "doc_id", "text")
    val got = Ngram.surprisalBuckets(scored, "doc_id")
      .select("doc_id", "surprisal_milli", "idx", "bucket")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    val n = got.size
    // reference: rank along (surprisal, id), bucket = 1 + 3*idx/n
    val expect = got.map(r => (r._2, r._1)).sorted.zipWithIndex
      .map { case ((s, id), i) =>
        (id, s, i.toLong, (1 + 3 * i / n).toInt) }
      .sortBy(_._1).toSeq
    assert(got == expect)
    val sizes = got.groupBy(_._4).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 1)
    // bucket is monotone along the global score order
    val inOrder = got.sortBy(r => (r._2, r._1)).map(_._4)
    assert(inOrder == inOrder.sorted)
  }
}
