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

  test("asofJoinBroadcast (native exec): same result as the " +
      "union-window form, shuffle-free probe-side plan") {
    val left = Seq(
      (1L, 100L, 10L), (1L, 60L, 11L), (1L, 10L, 12L), (2L, 500L, 13L)
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, 50L, 100L), (1L, 100L, 101L), (1L, 100L, 102L),
      (1L, 200L, 103L), (2L, 400L, 104L)
    ).toDF("k", "t", "rid")
    val native = Joins.asofJoinBroadcast(left, right, key = "k",
      time = "t", payload = Seq("rid"), rightTiebreak = Seq("rid"))
    // identical output schema and rows as the union-window form
    val window = Joins.asofJoinBackward(left, right, key = "k",
      time = "t", payload = Seq("rid"), rightTiebreak = Seq("rid"))
    assert(native.columns.toSeq == window.columns.toSeq)
    assert(native.collect().toSet == window.collect().toSet)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), s"strategy not used:\n$plan")
    // the whole point of the broadcast form: NO exchange, NO sort
    assert(!plan.contains("Exchange") && !plan.contains("Sort"),
      s"probe side should stream shuffle-free:\n$plan")
  }

  test("asofJoinBroadcast: self-derived sides (shared scan lineage) " +
      "analyze and match correctly") {
    // clicks and views filtered from ONE parent — the exprId-collision
    // shape that breaks naive custom-plan construction
    val ev = Seq(
      (1L, 10L, "view", 900L), (1L, 20L, "click", 901L),
      (1L, 30L, "view", 902L), (1L, 30L, "click", 903L),
      (2L, 5L, "click", 904L)
    ).toDF("user", "ts", "kind", "eid")
    val clicks = ev.filter($"kind" === "click")
      .select($"user", $"ts", $"eid".as("click_id"))
    val views = ev.filter($"kind" === "view")
      .select($"user", $"ts", $"eid".as("view_id"))
    val out = Joins.asofJoinBroadcast(clicks, views, key = "user",
        time = "ts", payload = Seq("view_id"),
        rightTiebreak = Seq("view_id"))
      .orderBy("click_id").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (901L, 900L), // click@20 ← view@10
      (903L, 902L), // click@30 ← view@30 (≤ includes equal ts)
      (904L, -1L))) // user 2 has no views
  }

  test("asofJoinBroadcast: null stream keys/times yield null payload, " +
      "null build keys/times never match") {
    val left = Seq((Some(1L), Some(100L), 1L), (None, Some(100L), 2L),
      (Some(1L), None, 3L)).toDF("k", "t", "lid")
    val right = Seq((Some(1L), Some(50L), 10L), (None, Some(40L), 11L),
      (Some(1L), None, 12L)).toDF("k", "t", "rid")
    val out = Joins.asofJoinBroadcast(left, right, key = "k", time = "t",
        payload = Seq("rid"), rightTiebreak = Seq("rid"))
      .orderBy("lid").collect()
      .map(r => if (r.isNullAt(3)) -1L else r.getLong(3))
    assert(out.toSeq == Seq(10L, -1L, -1L))
  }

  test("asofJoinBroadcast: mismatched key/time types are rejected at " +
      "construction (exec would CCE or silently miss matches)") {
    val left = Seq((1, 100L, 1L)).toDF("k", "t", "lid") // k: INT
    val right = Seq((1L, 50L, 10L)).toDF("k", "t", "rid") // k: BIGINT
    val e = intercept[IllegalArgumentException] {
      Joins.asofJoinBroadcast(left, right, key = "k", time = "t",
        payload = Seq("rid"), rightTiebreak = Seq("rid"))
    }
    assert(e.getMessage.contains("types differ"))
    val left2 = Seq((1L, 100, 1L)).toDF("k", "t", "lid") // t: INT
    val e2 = intercept[IllegalArgumentException] {
      Joins.asofJoinBroadcast(left2, right, key = "k", time = "t",
        payload = Seq("rid"), rightTiebreak = Seq("rid"))
    }
    assert(e2.getMessage.contains("time types differ"))
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
