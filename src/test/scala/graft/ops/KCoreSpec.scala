package graft.ops

import graft.SparkSpec

@org.scalatest.tags.Slow
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line parallel-peel reference (set arithmetic). */
  private def reference(edges: Seq[(Long, Long)], k: Int,
                        rounds: Int): Map[Long, Option[Int]] = {
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    var alive = adj.keySet.toSet
    val removed = scala.collection.mutable.Map[Long, Int]()
    for (r <- 1 to rounds) {
      val rm = alive.filter(v => (adj(v) & alive).size < k)
      rm.foreach(v => removed(v) = r)
      alive = alive -- rm
    }
    adj.keySet.toSeq.map(v => v -> removed.get(v)).toMap
  }

  private def run(edges: Seq[(Long, Long)], k: Int,
                  rounds: Int): Map[Long, Option[Int]] =
    KCore.peel(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap

  test("hand case: pendant chain peels inward round by round; " +
      "triangle core survives") {
    // triangle {1,2,3} + chain 3-4-5-6: at k=2 the chain peels from
    // the tip inward one node per round; the triangle is the 2-core
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = run(edges, k = 2, rounds = 4)
    assert(got == Map(1L -> None, 2L -> None, 3L -> None,
      4L -> Some(3), 5L -> Some(2), 6L -> Some(1)))

    // under-provisioned rounds stop early: node 4 still alive after 2
    val early = run(edges, k = 2, rounds = 2)
    assert(early(4L) == None && early(5L) == Some(2) &&
      early(6L) == Some(1))

    // self-loops and duplicate/reversed edges don't count as degree
    val dirty = edges ++ Seq((6L, 6L), (2L, 1L), (1L, 2L))
    assert(run(dirty, 2, 4) == got)
  }

  test("fuzz: 60 random graphs equal the parallel-peel reference") {
    val rnd = new scala.util.Random(0xc04eL)
    for (round <- 0 until 60) {
      val n = 4 + rnd.nextInt(20)
      val edges = (0 until 2 * n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val k = 1 + rnd.nextInt(4)
        val rounds = 1 + rnd.nextInt(5)
        assert(run(edges, k, rounds) == reference(edges, k, rounds),
          s"round $round k=$k rounds=$rounds edges=$edges")
      }
    }
  }
}
