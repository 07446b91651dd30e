package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The scaladoc claim behind [[StreamingOps.viewClickJoin]] — "state
  * on each side is pruned" — verified from the query's own state-store
  * metrics, not asserted on faith. The join condition carries BOTH the
  * exact-micros predicates (for byte-exact lag arithmetic) and the
  * timestamp-typed interval predicates; Spark's StreamingJoinHelper
  * logs a WARN stack probing the micros conjuncts (it evals raw
  * AttributeReferences while trying each conjunct — benign, caught
  * inside the helper), then derives the state watermark from the
  * time-typed conjuncts. This spec pins that the derivation actually
  * happens: feed three batches days apart and the join state must
  * shed the old batches' rows instead of accumulating all input. */
class JoinStateBoundSpec extends SparkSpec {

  private val MinUs = 60L * 1000000L
  private val DayUs = 86400L * 1000000L
  private val BaseUs = // 2024-01-01 as epoch micros
    java.time.LocalDate.of(2024, 1, 1).toEpochDay * DayUs

  test("stream-stream join state is watermark-pruned, not " +
      "accumulate-everything (metrics-verified)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Long, Long, String)]
    val events = in.toDF().toDF("event_id", "user_id", "ts", "event_type")
    val q = StreamingOps.viewClickJoin(events, withinUs = 30L * MinUs)
      .writeStream.format("memory").queryName("join_state_test")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      def pairs() = spark.table("join_state_test")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      // batch 1: two view->click funnels on day 1 (4 rows of state)
      in.addData((1L, 7L, BaseUs, "view"),
        (2L, 7L, BaseUs + MinUs, "click"),
        (3L, 8L, BaseUs + 2L * MinUs, "view"),
        (4L, 8L, BaseUs + 3L * MinUs, "click"))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (3L, 4L)))
      // batch 2: a funnel 10 days on — its watermark (max - 1 h) puts
      // every batch-1 row past any possible future match
      in.addData((5L, 9L, BaseUs + 10L * DayUs, "view"),
        (6L, 9L, BaseUs + 10L * DayUs + MinUs, "click"))
      q.processAllAvailable()
      // batch 3: 20 days on — the trigger that runs WITH batch 2's
      // watermark, so batch 1's four rows must now be evicted
      in.addData((7L, 9L, BaseUs + 20L * DayUs, "view"),
        (8L, 9L, BaseUs + 20L * DayUs + MinUs, "click"))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)))
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      // 8 rows fed; retaining all of them would read 8. Pruning must
      // have shed at least batch 1 (eviction runs a trigger behind the
      // watermark, so batches 2-3 may both still be inside state).
      assert(state.head.numRowsTotal <= 4L,
        s"join state ${state.head.numRowsTotal} rows — watermark " +
          "eviction did not fire (8 rows were fed)")
    } finally q.stop()
  }
}
