package graft.ops

import graft.SparkSpec

/** Backward as-of join semantics: ≤ matching, equal-timestamp ties,
  * right-side tie-break, and no-match nulls. Plus the bucketized
  * range join's boundary and multi-bucket behavior. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoinBucketed: [lo, hi) bounds, multi-bucket spans, " +
      "no duplicate pairs, equi-join plan") {
    val left = Seq((1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L),
      (5L, 999L)).toDF("lid", "v")
    val right = Seq((10L, 0L, 100L),    // [0,100): lids 1,2
      (11L, 50L, 450L),                 // spans buckets 0..4: lids 2,3,4
      (12L, 999L, 1000L)                // [999,1000): lid 5
    ).toDF("rid", "lo", "hi")
    val joined = Joins.rangeJoinBucketed(left, "v", right, "lo", "hi",
      bucketWidth = 100L)
    val out = joined.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L),
      (4L, 11L), (5L, 12L)))
    // the whole point: an equi-join on the bucket id, never a
    // nested-loop over all pairs
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"degraded plan:\n$plan")
  }

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

  test("payload column on the left side is rejected, not corrupted") {
    // if "rid" also existed on the left, unionByName would feed left
    // values into last(..., ignoreNulls) and rows would match
    // themselves — must fail fast instead
    val left = Seq((1L, 100L, 999L)).toDF("k", "t", "rid")
    val right = Seq((1L, 50L, 100L)).toDF("k", "t", "rid")
    val e = intercept[IllegalArgumentException] {
      Joins.asofJoinBackward(left, right, key = "k", time = "t",
        payload = Seq("rid"), rightTiebreak = Seq("rid"))
    }
    assert(e.getMessage.contains("rid"))
  }
}
