package graft.ops

import scala.util.Random

import graft.SparkSpec

/** [[PageRank.pageRank]] vs a straight-line JVM replay of the
  * documented integer-milli recurrence on seeded random digraphs —
  * bit-identical is the op's own contract ("the result is
  * bit-identical on any engine at any parallelism"), so the fuzz
  * compares exact maps, covering the shapes the deterministic specs
  * don't: dangling nodes, sinks, multi-in-degree hubs, cycles. */
@org.scalatest.tags.Slow
class PageRankFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def refPageRank(edges: Seq[(Long, Long)],
                          iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val in = edges.groupBy(_._2)
    var pr = nodes.map(_ -> 1000L).toMap
    for (_ <- 1 to iters) {
      pr = nodes.map { v =>
        val s = in.getOrElse(v, Seq.empty).map { case (u, _) =>
          pr(u) / deg(u) // u has an out-edge by construction
        }.sum
        v -> (150L + (850L * s) / 1000L)
      }.toMap
    }
    pr
  }

  test("pageRank == integer-milli reference on seeded random " +
      "digraphs (cycles, sinks, hubs; 5 iterations)") {
    for ((seed, n, m) <- Seq((2L, 25, 60), (8L, 60, 90), (21L, 15, 70))) {
      val rnd = new Random(seed)
      val edges = (0 until m).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.distinct.filter { case (a, b) => a != b } // callers dedupe
      val got = PageRank.pageRank(edges.toDF("src", "dst"), iters = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = refPageRank(edges, 5)
      assert(got === exp,
        s"seed=$seed n=$n m=$m: " +
          s"diff=${(got.toSet diff exp.toSet).take(5)} / " +
          s"${(exp.toSet diff got.toSet).take(5)}")
    }
  }
}
