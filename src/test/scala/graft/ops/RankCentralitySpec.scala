package graft.ops

import graft.SparkSpec

@org.scalatest.tags.Slow
class RankCentralitySpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line replay of the documented integer recurrence —
    * plain maps, no joins, independent of the Spark dataflow. */
  private def reference(duels: Seq[(Long, Long, Boolean)],
                        iters: Int): Map[Long, Long] = {
    val pairs = duels.groupBy(d => (d._1, d._2)).map { case ((i, j), ds) =>
      (i, j, ds.size.toLong, ds.count(_._3).toLong)
    }.toSeq
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map { case (id, o) => id -> o.size.toLong }
    val dm = deg.values.max
    val edges = pairs.map { case (i, j, n, wi) =>
      (i, j, (n - wi) * 1000000000L / (n * dm))
    } ++ pairs.map { case (i, j, n, wi) =>
      (j, i, wi * 1000000000L / (n * dm))
    }
    val outr = edges.groupBy(_._1).map { case (id, es) =>
      id -> es.map(_._3).sum
    }.withDefaultValue(0L)
    val ids = deg.keys.toSeq
    var s = ids.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (id, es) =>
        id -> es.map(e => s(e._1) * e._3).sum
      }.withDefaultValue(0L)
      val raw = ids.map(i =>
        i -> (s(i) - s(i) * outr(i) / 1000000000L +
          in(i) / 1000000000L)).toMap
      val mx = raw.values.max
      s = ids.map(i => i -> raw(i) * 1000000L / mx).toMap
    }
    s
  }

  test("hand case: dominant entity anchors at 1e6; scores order by " +
      "strength; all-loss entity decays toward zero") {
    val duels = Seq((1L, 2L, true), (1L, 2L, true), (1L, 3L, true),
      (2L, 3L, true))
    val out = RankCentrality.fit(
        duels.toDF("i", "j", "awin"), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == reference(duels, 8))
    assert(out(1L) == 1000000L) // won everything: the stationary max
    assert(out(1L) > out(2L) && out(2L) > out(3L))
    assert(out(3L) < 200000L)   // never won: mass drains away
  }

  test("fuzz: Spark dataflow == straight-line replay on random duel " +
      "streams") {
    val rnd = new scala.util.Random(0x4ac5L)
    for (round <- 0 until 20) {
      val m = 3 + rnd.nextInt(10)
      val duels = (0 until 20 + rnd.nextInt(200)).flatMap { _ =>
        val a = rnd.nextInt(m).toLong
        val b = rnd.nextInt(m).toLong
        if (a == b) None
        else {
          val (i, j) = (math.min(a, b), math.max(a, b))
          Some((i, j, if (rnd.nextInt(4) > 0) i > j else i < j))
        }
      }
      if (duels.nonEmpty) {
        val iters = 1 + rnd.nextInt(6)
        val out = RankCentrality.fit(
            duels.toDF("i", "j", "awin"), iters)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(out == reference(duels, iters), s"round $round")
      }
    }
  }
}
