package graft.ops

import graft.SparkSpec

@org.scalatest.tags.Slow
class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line replay of the documented integer recurrence —
    * independent of the Spark dataflow (plain maps, no joins). */
  private def reference(duels: Seq[(Long, Long, Boolean)],
                        iters: Int): Map[Long, Long] = {
    val pairs = duels.groupBy(d => (d._1, d._2)).map { case ((i, j), ds) =>
      (i, j, ds.size.toLong, ds.count(_._3).toLong)
    }.toSeq
    val sym = pairs.map(p => (p._1, p._2, p._3)) ++
      pairs.map(p => (p._2, p._1, p._3))
    val ids = sym.map(_._1).distinct
    val w = ids.map { id =>
      id -> (pairs.filter(_._1 == id).map(_._4).sum +
        pairs.filter(_._2 == id).map(p => p._3 - p._4).sum)
    }.toMap
    var s = ids.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val den = sym.groupBy(_._1).map { case (i, es) =>
        i -> es.map(e => e._3 * 1000000000L / (s(e._1) + s(e._2))).sum
      }
      val raw = ids.map(i => i -> w(i) * 1000000000L / den(i)).toMap
      val mx = raw.values.max
      s = ids.map(i => i -> math.max(1L, raw(i) * 1000000L / mx)).toMap
    }
    s
  }

  test("hand case: dominant entity anchors at 1e6; all-losses floors " +
      "at 1; scores order by strength") {
    // 1 beats 2 twice and 3 once; 2 beats 3 once; 3 never wins
    val duels = Seq((1L, 2L, true), (1L, 2L, true), (1L, 3L, true),
      (2L, 3L, true))
    val out = BradleyTerry.fit(
        duels.toDF("i", "j", "awin"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1000000L)        // won everything: the anchor
    assert(out(3L) == 1L)              // won nothing: the floor
    assert(out(1L) > out(2L) && out(2L) > out(3L))
    assert(out == reference(duels, 5))
  }

  test("fuzz: Spark dataflow == straight-line replay on random duel " +
      "streams (skewed strengths, zero-win entities, repeat pairs)") {
    val rnd = new scala.util.Random(1337L)
    for (round <- 0 until 20) {
      val m = 3 + rnd.nextInt(10)
      val nd = 20 + rnd.nextInt(200)
      val duels = (0 until nd).flatMap { _ =>
        val a = rnd.nextInt(m).toLong
        val b = rnd.nextInt(m).toLong
        if (a == b) None
        else {
          val (i, j) = (math.min(a, b), math.max(a, b))
          // latent strength = id: higher id wins with prob 3/4
          val iwin = if (rnd.nextInt(4) > 0) i > j else i < j
          Some((i, j, iwin))
        }
      }
      if (duels.nonEmpty) {
        val iters = 1 + rnd.nextInt(6)
        val out = BradleyTerry.fit(
            duels.toDF("i", "j", "awin"), iters)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(out == reference(duels, iters), s"round $round")
      }
    }
  }

  test("incremental refresh: merged pair matrix refits bit-identical " +
      "to a from-scratch fit on the full duel history") {
    val rnd = new scala.util.Random(0x1ec4L)
    for (round <- 0 until 10) {
      val m = 3 + rnd.nextInt(8)
      val duels = (0 until 40 + rnd.nextInt(150)).flatMap { _ =>
        val a = rnd.nextInt(m).toLong
        val b = rnd.nextInt(m).toLong
        if (a == b) None
        else Some((math.min(a, b), math.max(a, b), rnd.nextBoolean()))
      }
      // arbitrary split, including tranches with unseen entities
      val (hist, delta) = duels.splitAt(duels.size * 2 / 3)
      if (hist.nonEmpty && delta.nonEmpty) {
        val merged = BradleyTerry.mergePairs(
          BradleyTerry.pairStats(hist.toDF("i", "j", "awin")),
          BradleyTerry.pairStats(delta.toDF("i", "j", "awin")))
        val incr = BradleyTerry.fitFromPairs(merged, 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val full = BradleyTerry.fit(duels.toDF("i", "j", "awin"), 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(incr == full, s"round $round")
        assert(incr == reference(duels, 3), s"round $round vs replay")
      }
    }
  }

  /** Straight-line calibration reference over [[reference]] scores. */
  private def calRef(duels: Seq[(Long, Long, Boolean)],
                     iters: Int): Map[Long, (Long, Long, Long)] = {
    val s = reference(duels, iters)
    duels.map { case (i, j, awin) => (s(i), s(j), awin) }
      .filter { case (si, sj, _) => si != sj }
      .groupBy { case (si, sj, _) => math.abs(si - sj) / 100000L }
      .map { case (dec, ds) =>
        val n = ds.size.toLong
        val w = ds.count { case (si, sj, awin) => (si > sj) == awin }
          .toLong
        dec -> (n, w, w * 1000L / n)
      }
  }

  test("calibration: hand anchors and fuzz vs straight-line replay") {
    // dominant entity 1 (score 1e6) vs floor entity 3 (score 1):
    // gap decile 9; the higher-scored side won that duel.
    val duels = Seq((1L, 2L, true), (1L, 2L, true), (1L, 3L, true),
      (2L, 3L, true))
    val got = BradleyTerry.calibration(
        duels.toDF("i", "j", "awin"),
        BradleyTerry.fit(duels.toDF("i", "j", "awin"), 5))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got == calRef(duels, 5))
    assert(got(9L)._3 == 1000L) // the 1-vs-3 duel: max gap, correct

    val rnd = new scala.util.Random(0xca11b8L)
    for (round <- 0 until 15) {
      val m = 3 + rnd.nextInt(8)
      val fuzz = (0 until 30 + rnd.nextInt(150)).flatMap { _ =>
        val a = rnd.nextInt(m).toLong
        val b = rnd.nextInt(m).toLong
        if (a == b) None
        else Some((math.min(a, b), math.max(a, b),
          if (rnd.nextInt(4) > 0) math.min(a, b) > math.max(a, b)
          else true))
      }
      if (fuzz.nonEmpty) {
        val out = BradleyTerry.calibration(
            fuzz.toDF("i", "j", "awin"),
            BradleyTerry.fit(fuzz.toDF("i", "j", "awin"), 3))
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
            r.getLong(3))).toMap
        assert(out == calRef(fuzz, 3), s"round $round")
      }
    }
  }
}
