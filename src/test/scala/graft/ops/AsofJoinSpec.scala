package graft.ops

import graft.SparkSpec

/** Backward as-of join semantics: ≤ matching, equal-timestamp ties,
  * right-side tie-break, and no-match nulls. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("latest right row at-or-before each left time, per key") {
    val left = Seq(
      (1L, 100L, 10L),  // after right@50 and right@100 → ties at 100
      (1L, 60L, 11L),   // between 50 and 100 → right@50
      (1L, 10L, 12L),   // before any right row → null
      (2L, 500L, 13L)   // key with single earlier right row
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, 50L, 100L), (1L, 100L, 101L), (1L, 100L, 102L), // tie: max id
      (1L, 200L, 103L),                                    // in the future
      (2L, 400L, 104L)
    ).toDF("k", "t", "rid")
    val out = Joins.asofJoinBackward(left, right, key = "k", time = "t",
        payload = Seq("rid"), rightTiebreak = Seq("rid"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (10L, 102L), // t=100: ≤ includes both rid 101/102, tiebreak → 102
      (11L, 100L),
      (12L, -1L),  // no right row at or before t=10
      (13L, 104L)))
  }
}
