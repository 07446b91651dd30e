package graft.ops

import scala.util.Random

import graft.SparkSpec

/** [[Components.connectedComponents]] vs a brute union-find on seeded
  * random graphs — the deterministic specs pin chains/triangles; this
  * covers the shapes iteration bugs hide in (many small components,
  * one giant component, self-loops, duplicate and reversed edges).
  * Labels are min-id per component by contract, so the comparison is
  * exact, not just partition-equal. */
@org.scalatest.tags.Slow
class ComponentsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  test("connectedComponents == union-find min-id labels on seeded " +
      "random graphs (sparse, dense, giant-component, self-loops)") {
    for ((seed, nNodes, nEdges) <- Seq((1L, 60, 25), (2L, 40, 120),
        (3L, 200, 180), (4L, 30, 40))) {
      val rnd = new Random(seed)
      val edges = (0 until nEdges).map { _ =>
        val a = rnd.nextInt(nNodes).toLong
        // self-loops and duplicates allowed; both orientations appear
        val b = rnd.nextInt(nNodes).toLong
        if (rnd.nextBoolean()) (a, b) else (b, a)
      }
      val got = Components.connectedComponents(
          edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = unionFind(edges)
      assert(got === exp,
        s"seed=$seed n=$nNodes m=$nEdges: " +
          s"diff=${(got.toSet diff exp.toSet).take(5)} / " +
          s"${(exp.toSet diff got.toSet).take(5)}")
    }
  }
}
