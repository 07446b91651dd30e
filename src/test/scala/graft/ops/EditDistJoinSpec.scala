package graft.ops

import graft.SparkSpec

class EditDistJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], d: Int) =
    Similarity.editDistanceJoin(rows.toDF("id", "text"), maxDist = d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("finds substitution, insertion, deletion pairs within maxDist; " +
      "rejects beyond") {
    val out = run(Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),   // identical -> dist 0
      (3L, "the quick brown fax jumps"),   // 1 substitution
      (4L, "the quick brown foxx jumps"),  // 1 insertion (length +1)
      (5L, "the quick brown fo jumps"),    // 1 deletion (length -1)
      (6L, "the quick brown cat sleeps"),  // far away
      (7L, "xXthe quick brown fox jumpsZz") // 4 edits
    ), d = 2)
    val pairs = out.map(t => (t._1, t._2))
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((1L, 4L)) && pairs.contains((1L, 5L)))
    assert(out.find(t => t._1 == 1L && t._2 == 2L).get._3 == 0L)
    assert(out.find(t => t._1 == 1L && t._2 == 3L).get._3 == 1L)
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
    assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L))
    // transitivity of the planted family: 3,4,5 are within 2 of
    // each other too (sub+ins etc.)
    assert(pairs.contains((3L, 4L)) && pairs.contains((4L, 5L)))
  }

  test("edits at segment boundaries still caught (pigeonhole shifts)") {
    val base = "abcdefghijklmnopqrstuvwxyz012345"
    // d=2, nSeg=3: segments ~11/11/10; edit INSIDE each segment region
    // leaves the others intact; also an insertion early shifts all
    // later segment positions by 1 (within the +-d window)
    val out = run(Seq(
      (1L, base),
      (2L, "Z" + base.substring(1)),           // first char substituted
      (3L, base.substring(0, 15) + "Z" + base.substring(16)), // middle
      (4L, base.substring(0, 31) + "Z"),       // last char
      (5L, "ZZ" + base)                        // 2 insertions at front
    ), d = 2)
    val pairs = out.map(t => (t._1, t._2))
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((1L, 4L)) && pairs.contains((1L, 5L)))
  }

  test("no self-pairs, no duplicate ROWS, output canonically ordered") {
    // collect as Seq, not Set: a regression dropping the candidate
    // distinct would emit duplicate rows a Set comparison cannot see
    val rows = Similarity.editDistanceJoin(
        Seq((1L, "aaaaaaaaaa"), (2L, "aaaaaaaaab"), (3L, "aaaaaaaabb"))
          .toDF("id", "text"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(rows.size == rows.distinct.size, s"duplicate rows: $rows")
    assert(rows.forall(t => t._1 < t._2))
    assert(rows.map(t => (t._1, t._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
