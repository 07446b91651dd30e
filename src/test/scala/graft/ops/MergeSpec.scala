package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-family semantics: upsert replace/append, CDC latest-wins with
  * delete suppression, SCD2 interval chaining. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert replaces matched keys and appends new ones") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val delta = Seq((2L, "B"), (9L, "i")).toDF("k", "v")
    val out = Merge.upsert(snap, delta, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "i")))
  }

  test("applyCdc: latest change wins, deletes suppress, rest pass") {
    val snap = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val changes = Seq(
      (1L, 11L, 1L, "U"), (1L, 12L, 2L, "U"),   // k=1: latest U v=12
      (2L, 99L, 1L, "U"), (2L, 0L, 2L, "D"),    // k=2: latest D → gone
      (4L, 40L, 1L, "U"), (4L, 41L, 2L, "D"),
      (4L, 42L, 3L, "U")                        // k=4: insert via U
    ).toDF("k", "v", "seq", "op")
    val out = Merge.applyCdc(snap, changes, Seq("k"), Seq("seq"), "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 12L), (3L, 30L), (4L, 42L)))
  }

  test("applyCdc rejects changes missing the snapshot schema") {
    val snap = Seq((1L, 10L)).toDF("k", "v")
    val bad = Seq((1L, 1L, "U")).toDF("k", "seq", "op") // no v
    intercept[IllegalArgumentException] {
      Merge.applyCdc(snap, bad, Seq("k"), Seq("seq"), "op")
    }
  }

  test("upsert/applyCdc do not force a broadcast: a fact-sized delta " +
      "plans as a shuffled anti-join") {
    // simulate "delta too big to broadcast" by zeroing the threshold:
    // with no forced hint the planner must fall back to a shuffled
    // join instead of failing on broadcast limits at real scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val snap = spark.range(1000).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val delta = spark.range(900).select(col("id").as("k"),
        (col("id") * 3).as("v"))
      val up = Merge.upsert(snap, delta, Seq("k"))
      val plan = up.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"expected shuffled anti-join for a large delta:\n$plan")
      assert(up.count() == 1000)
      val changes = delta.withColumn("seq", lit(1L))
        .withColumn("op", lit("U"))
      val cdc = Merge.applyCdc(snap, changes, Seq("k"), Seq("seq"), "op")
      val cdcPlan = cdc.queryExecution.executedPlan.toString
      assert(!cdcPlan.contains("BroadcastExchange"),
        s"expected shuffled anti-join for a large change batch:\n$cdcPlan")
      assert(cdc.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("upsert still broadcasts a small delta when the planner may") {
    val snap = spark.range(1000).select(col("id").as("k"),
      (col("id") * 2).as("v"))
    val delta = Seq((1L, 7L), (2000L, 8L)).toDF("k", "v")
    val plan = Merge.upsert(snap, delta, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"small key set should be planner-broadcast:\n$plan")
  }

  test("diffSnapshots classifies added/removed/changed with null-safe " +
      "payload comparison") {
    val prev = Seq((1L, Some("a")), (2L, None), (3L, Some("c")),
      (4L, Some("d"))).toDF("k", "v")
    val next = Seq((1L, Some("a")), (2L, None), (3L, Some("X")),
      (5L, Some("e"))).toDF("k", "v")
    val out = Merge.diffSnapshots(prev, next, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getAs[String]("status"))).toSeq
    // k=2: NULL payload on both sides must compare EQUAL (unchanged)
    assert(out == Seq((1L, "unchanged"), (2L, "unchanged"),
      (3L, "changed"), (4L, "removed"), (5L, "added")))
    intercept[IllegalArgumentException] {
      Merge.diffSnapshots(prev, next.withColumnRenamed("v", "w"), Seq("k"))
    }
  }

  test("scd2 chains validity intervals per key") {
    val versions = Seq(
      (1L, 100L, "x1"), (1L, 200L, "x2"), (1L, 300L, "x3"),
      (2L, 150L, "y1")
    ).toDF("k", "eff", "payload")
    val out = Merge.scd2(versions, Seq("k"), "eff", Seq("payload"))
      .orderBy("k", "valid_from")
      .select("k", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, 100L, 200L, 0), (1L, 200L, 300L, 0), (1L, 300L, -1L, 1),
      (2L, 150L, -1L, 1)))
  }
}
