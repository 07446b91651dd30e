package graft.ops

import graft.SparkSpec

class PreferenceAuditSpec extends SparkSpec {
  import spark.implicits._

  /** Brute reference: all triples over the majority graph, direction
    * looked up in a map — independent of the degree-oriented listing. */
  private def reference(duels: Seq[(Long, Long, Boolean)],
                        minDuels: Long): (Long, Long, Long) = {
    val maj = duels.groupBy(d => (d._1, d._2)).flatMap {
      case ((i, j), ds) =>
        val n = ds.size.toLong
        val wi = ds.count(_._3).toLong
        if (n >= minDuels && wi * 2 != n) Some((i, j) -> (wi * 2 > n))
        else None
    }.toMap
    val ids = maj.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    def beats(x: Long, y: Long): Option[Boolean] =
      if (x < y) maj.get((x, y)) else maj.get((y, x)).map(!_)
    var tri = 0L
    var cyc = 0L
    for {
      a <- ids; b <- ids if a < b; c <- ids if b < c
      ab <- beats(a, b); bc <- beats(b, c); ac <- beats(a, c)
    } {
      tri += 1
      if ((ab && bc && !ac) || (!ab && !bc && ac)) cyc += 1
    }
    (maj.size.toLong, tri, cyc)
  }

  private def run(duels: Seq[(Long, Long, Boolean)], minDuels: Long) = {
    val r = PreferenceAudit.transitivityAudit(
      duels.toDF("i", "j", "awin"), minDuels).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))
  }

  test("hand case: one cyclic and one transitive triangle") {
    // majority (2 duels each, unanimous): 1>2, 2>3, 3>1 (cycle);
    // 1>4, 2>4 close (1,2,4) transitively
    val maj = Seq((1L, 2L, true), (2L, 3L, true), (1L, 3L, false),
      (1L, 4L, true), (2L, 4L, true))
    val duels = maj.flatMap(m => Seq(m, m))
    val (e, t, c, m) = run(duels, minDuels = 2L)
    assert(e == 5L && t == 2L && c == 1L && m == Some(500L))
  }

  test("tied and under-threshold pairs carry no edge; triangle-free " +
      "graph reports (0, 0, null)") {
    val duels = Seq(
      (1L, 2L, true), (1L, 2L, false),  // exact tie: no edge
      (2L, 3L, true),                   // 1 duel < minDuels: no edge
      (3L, 4L, true), (3L, 4L, true))   // edge, but no triangle
    val (e, t, c, m) = run(duels, minDuels = 2L)
    assert(e == 1L && t == 0L && c == 0L && m.isEmpty)
  }

  test("fuzz: degree-oriented audit == brute triple enumeration on " +
      "random tournaments (dense, sparse, tie-heavy)") {
    val rnd = new scala.util.Random(4242L)
    for (round <- 0 until 15) {
      val m = 4 + rnd.nextInt(9)
      val nd = 30 + rnd.nextInt(250)
      val minDuels = 1L + rnd.nextInt(3)
      val duels = (0 until nd).flatMap { _ =>
        val a = rnd.nextInt(m).toLong
        val b = rnd.nextInt(m).toLong
        if (a == b) None
        else Some((math.min(a, b), math.max(a, b), rnd.nextBoolean()))
      }
      if (duels.nonEmpty) {
        val (re, rt, rc) = reference(duels, minDuels)
        val (e, t, c, milli) = run(duels, minDuels)
        assert((e, t, c) == (re, rt, rc), s"round $round")
        assert(milli == (if (rt == 0) None else Some(rc * 1000 / rt)))
      }
    }
  }
}
