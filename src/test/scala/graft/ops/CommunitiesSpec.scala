package graft.ops

import graft.SparkSpec

/** Label propagation against a hand-replayable reference: two cliques
  * joined by one bridge edge must settle into two communities labeled
  * by each clique's smallest id; the bridge node follows its majority
  * side. Plus a driver-side replay on seeded random graphs. */
class CommunitiesSpec extends SparkSpec {

  private def lpaReference(edges: Seq[(Long, Long)],
                           iters: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = adj.map { case (n, nbrs) =>
        val tally = nbrs.groupBy(lbl).map { case (l, xs) => l -> xs.size }
        val maxC = tally.values.max
        n -> tally.filter(_._2 == maxC).keys.min
      }
    }
    lbl
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Communities.labelPropagation(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap
  }

  test("two cliques with one bridge: each clique takes its min id") {
    val cliqueA = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 10L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((4L, 10L))
    val got = run(edges, 4)
    assert(got == lpaReference(edges, 4))
    assert((0L to 3L).forall(got(_) == 0L))
    assert((11L to 14L).forall(got(_) == 10L))
  }

  test("matches the synchronous reference on seeded random graphs, " +
      "with duplicate and self edges normalized") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val n = 60
      val edges = (0 until 500).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      } ++ Seq((1L, 1L), (2L, 3L), (2L, 3L)) // self + dup
      val iters = 1 + trial
      assert(run(edges, iters) ==
        lpaReference(edges.filter(e => e._1 != e._2), iters),
        s"trial $trial")
    }
  }
}
