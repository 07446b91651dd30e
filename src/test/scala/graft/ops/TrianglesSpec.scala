package graft.ops

import graft.SparkSpec

/** Triangle counting: hand-checkable graphs covering the shapes the
  * degree orientation can get wrong (ties, hubs, duplicate edges). */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 has 4 triangles, every node in 3") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val out = run(k4)
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("chain and star have no triangles") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    assert(run(Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L))).isEmpty)
  }

  test("hub with one closing edge: exactly one triangle, no double count") {
    // star around 9 plus edge (1,2): triangle {9,1,2} only — all-degree
    // ties between leaves exercise the id tiebreak
    val out = run(Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L), (1L, 2L)))
    assert(out == Map(9L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("duplicate, reversed, and self-loop edges are cleaned") {
    val out = run(Seq(
      (1L, 2L), (2L, 1L), (1L, 2L),  // dup + reversed
      (2L, 3L), (3L, 1L),
      (2L, 2L)))                      // self-loop
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge attribute per corner") {
    // {1,2,3} and {2,3,4}: nodes 2,3 in 2 triangles; 1,4 in 1
    val out = run(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}
