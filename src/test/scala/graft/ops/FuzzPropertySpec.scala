package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Seeded randomized properties for the candidate-pruned operators:
  * the pruned form must equal the brute-force definition on corpora it
  * did not see during development. Fixed seeds — failures reproduce. */
@org.scalatest.tags.Slow
class FuzzPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpus(seed: Long, n: Int, alphabet: String,
                           minLen: Int, maxLen: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    // half fresh random strings, half mutated copies of earlier ones
    // (sub/ins/del), so true near-pairs actually exist
    val base = (0 until n / 2).map { i =>
      val l = minLen + rnd.nextInt(maxLen - minLen + 1)
      (i.toLong, Seq.fill(l)(alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    }
    val mutated = (0 until n - n / 2).map { j =>
      val (_, src) = base(rnd.nextInt(base.size))
      val edits = 1 + rnd.nextInt(3) // 1..3 edits (some beyond d=2)
      var s = src
      for (_ <- 1 to edits if s.length > 1) {
        val p = rnd.nextInt(s.length)
        rnd.nextInt(3) match {
          case 0 => s = s.updated(p, alphabet(rnd.nextInt(alphabet.length)))
          case 1 => s = s.substring(0, p) +
            alphabet(rnd.nextInt(alphabet.length)) + s.substring(p)
          case 2 => s = s.substring(0, p) + s.substring(p + 1)
        }
      }
      ((1000 + j).toLong, s)
    }
    base ++ mutated
  }

  private def bruteEd(rows: Seq[(Long, String)], d: Int) = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist.toLong)).toSet
  }

  test("editDistanceJoin == brute force on seeded random corpora " +
      "(low- and high-entropy alphabets, d = 1 and 2)") {
    for ((seed, alphabet) <- Seq(
        (42L, "ab"),                       // pathological low entropy
        (7L, "abcdefghijklmnopqrstuvwxyz")); d <- Seq(1, 2)) {
      val corpus = randomCorpus(seed, 60, alphabet, minLen = d + 1,
        maxLen = 24)
      val expected = bruteEd(corpus, d)
        // domain: pairs where BOTH sides length >= d+1 (documented)
        .filter { case (ia, ib, _) =>
          val m = corpus.toMap
          m(ia).length >= d + 1 && m(ib).length >= d + 1 }
      val got = Similarity.editDistanceJoin(
          corpus.toDF("id", "text"), maxDist = d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == expected,
        s"seed=$seed alphabet=${alphabet.length} d=$d: " +
          s"missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("containmentPairs == brute force on seeded random shingle " +
      "corpora (subset plants, overlapping vocab, threshold sweep)") {
    for (seed <- Seq(3L, 17L); t <- Seq(700, 900)) {
      val rnd = new Random(seed)
      val vocab = (0 until 60).map(i => f"v_$i%02d")
      // half random sets, half subsets/supersets of earlier ones so
      // true containments exist at varied C values
      val base = (0 until 25).map { i =>
        (i.toLong,
          rnd.shuffle(vocab).take(5 + rnd.nextInt(20)).toIndexedSeq)
      }
      val derived = (0 until 25).map { j =>
        val (_, src) = base(rnd.nextInt(base.size))
        val kept = src.filter(_ => rnd.nextDouble() > 0.15)
        val extra = rnd.shuffle(vocab).take(rnd.nextInt(10))
        ((100 + j).toLong, (kept ++ extra).distinct.toIndexedSeq)
      }
      val rows = (base ++ derived).filter(_._2.nonEmpty)
      val expected = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if sa.size < sb.size || (sa.size == sb.size && ia < ib)
        inter = sa.toSet.intersect(sb.toSet).size
        cm = math.floor(1000.0 * inter / sa.size + 0.5).toLong
        if cm >= t
      } yield (ia, ib, cm)).toSet
      val got = Similarity.containmentPairs(
          rows.toDF("id", "shingles"), thresholdMilli = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == expected,
        s"seed=$seed t=$t: missing=${expected -- got} " +
          s"extra=${got -- expected}")
    }
  }

  test("setSimilarityPairsExact == brute force on seeded random " +
      "shingle corpora (rewritten length/positional filters, " +
      "threshold sweep)") {
    for (seed <- Seq(13L, 47L); t <- Seq(700, 800)) {
      val rnd = new Random(seed)
      val vocab = (0 until 40).map(i => f"v_$i%02d")
      val base = (0 until 20).map { i =>
        (i.toLong,
          rnd.shuffle(vocab).take(6 + rnd.nextInt(18)).toIndexedSeq)
      }
      // near-copies at varied mutation rates so true pairs span the
      // threshold; sizes vary so the length filter is exercised
      val near = (0 until 20).map { j =>
        val (_, src) = base(rnd.nextInt(base.size))
        val kept = src.filter(_ => rnd.nextDouble() > 0.12)
        val extra = rnd.shuffle(vocab).take(rnd.nextInt(5))
        ((100 + j).toLong, (kept ++ extra).distinct.toIndexedSeq)
      }
      val rows = (base ++ near).filter(_._2.nonEmpty)
      val expected = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib
        inter = sa.toSet.intersect(sb.toSet).size
        union = sa.size + sb.size - inter
        jm = math.floor(1000.0 * inter / union + 0.5).toLong
        if jm >= t
      } yield (ia, ib, jm)).toSet
      val got = Similarity.setSimilarityPairsExact(
          rows.toDF("id", "shingles"), thresholdMilli = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == expected,
        s"seed=$seed t=$t: missing=${expected -- got} " +
          s"extra=${got -- expected}")
    }
  }

  test("containmentAgainstTokens == brute force (batch-in-corpus " +
      "direction, unseen-token batches included)") {
    for (seed <- Seq(5L, 29L)) {
      val rnd = new Random(seed)
      val vocab = (0 until 50).map(i => f"w_$i%02d")
      val corpus = (0 until 20).map { i =>
        (i.toLong,
          rnd.shuffle(vocab).take(8 + rnd.nextInt(15)).toIndexedSeq)
      }
      // batch: subsets of corpus docs (true containments), noisy
      // variants, and one doc of tokens the corpus has never seen
      // (exercises the freq left-join f→0 path; must emit nothing)
      val batch = corpus.take(8).zipWithIndex.map { case ((_, src), j) =>
        ((100 + j).toLong,
          (src.filter(_ => rnd.nextDouble() > 0.1) ++
            rnd.shuffle(vocab).take(rnd.nextInt(4))).distinct
            .toIndexedSeq)
      } :+ ((200L, (0 until 10).map(i => f"unseen_$i%02d")))
      val expected = (for {
        (ib, sb) <- batch; (ic, sc) <- corpus
        inter = sb.toSet.intersect(sc.toSet).size
        cm = math.floor(1000.0 * inter / sb.size + 0.5).toLong
        if cm >= 800
      } yield (ib, ic, cm)).toSet
      val corpusDf = corpus.toDF("id", "shingles")
      val toks = corpusDf.select(col("id"),
        explode(col("shingles")).as("t"))
      val freq = toks.groupBy("t").agg(count(lit(1)).as("f"))
      val got = Similarity.containmentAgainstTokens(
          batch.toDF("id", "shingles"), toks, corpusDf, freq,
          thresholdMilli = 800)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == expected,
        s"seed=$seed: missing=${expected -- got} extra=${got -- expected}")
      // hashed-store variant (round 16): a LONG-typed token index makes
      // containmentAgainstTokens probe on the xxhash64 alphabet — same
      // results by the coarsening lemma + exact verify
      val toksH = corpusDf.select(col("id"),
        explode(array_distinct(
          transform(col("shingles"), t => xxhash64(t)))).as("t"))
      val freqH = toksH.groupBy("t").agg(count(lit(1)).as("f"))
      val gotH = Similarity.containmentAgainstTokens(
          batch.toDF("id", "shingles"), toksH, corpusDf, freqH,
          thresholdMilli = 800)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(gotH == expected,
        s"seed=$seed hashed: missing=${expected -- gotH} " +
          s"extra=${gotH -- expected}")
    }
  }

  test("checksumDiff finds every seeded random drift and nothing else") {
    val rnd = new Random(123L)
    val base = (1L to 500L).map(i => (i, rnd.nextLong())).toSeq
    val mutatedKeys = rnd.shuffle(base.map(_._1)).take(5).toSet
    val droppedKeys = rnd.shuffle(base.map(_._1)).take(3).toSet
    val drifted = base.filterNot(r => droppedKeys.contains(r._1))
      .map { case (k, v) =>
        (k, if (mutatedKeys.contains(k)) v + 1 else v) }
    val a = base.toDF("k", "v")
    val b = drifted.toDF("k", "v")
    val diff = Reconcile.checksumDiff(a, b, Seq("k", "v"), 64).collect()
    assert(diff.nonEmpty && diff.length <= 16,
      s"${diff.length} buckets flagged for <= 8 changed rows")
    assert(Reconcile.checksumDiff(a, a, Seq("k", "v"), 64).count() == 0)
    // restoring the drift heals the diff (symmetric check)
    assert(Reconcile.checksumDiff(b, drifted.toDF("k", "v"),
      Seq("k", "v"), 64).count() == 0)
  }

  /** Driver-side reference BPE trainer: brute-force maps + JVM
    * String.replace, no Spark — a THIRD independent implementation of
    * the engine's definition (frequency-weighted overlapping pair
    * counts, lexicographic tie-break, and the replace-scan greedy
    * merge application over the padded space-joined form that
    * TextOps.bpeTrain and its DuckDB twin share). */
  private def refBpe(texts: Seq[String],
                     rounds: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[String, Long] = texts
      .flatMap("[a-z]+".r.findAllIn(_).toSeq)
      .groupBy(identity).map { case (w, g) =>
        (" " + w.map(_.toString).mkString(" ") + " ") -> g.size.toLong
      }.toSeq.groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, n) <- words) {
        val sy = w.trim.split(" ")
        for (i <- 0 until sy.length - 1)
          counts((sy(i), sy(i + 1))) =
            counts.getOrElse((sy(i), sy(i + 1)), 0L) + n
      }
      if (counts.nonEmpty) {
        val ((l, rt), cnt) = counts.toSeq.minBy { case ((a, b), c) =>
          (-c, a + " " + b)
        }
        out += ((r, l, rt, cnt))
        words = words.toSeq.map { case (w, n) =>
          (w.replace(s" $l $rt ", s" ${l + rt} "), n)
        }.groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }
      }
    }
    out.result()
  }

  test("bpeTrain == independent reference trainer on seeded random " +
      "corpora (pair weighting, tie-break, greedy merge application)") {
    for (seed <- Seq(11L, 22L, 33L)) {
      val rnd = new Random(seed)
      // small alphabet + short words force heavy pair collisions,
      // overlapping runs (aaa...), and count ties
      val texts = (0 until 40).map { _ =>
        (0 until (2 + rnd.nextInt(6))).map { _ =>
          Seq.fill(1 + rnd.nextInt(6))("ab c".charAt(rnd.nextInt(4)))
            .mkString
        }.mkString(" ")
      }
      val res = TextOps.bpeTrain(texts.toDF("text"), "text", rounds = 6)
      val got = res.merges.map(m => (m.rank, m.lhs, m.rhs, m.cnt))
      res.release()
      assert(got == refBpe(texts, 6),
        s"seed $seed: spark $got != reference ${refBpe(texts, 6)}")
    }
  }
}
