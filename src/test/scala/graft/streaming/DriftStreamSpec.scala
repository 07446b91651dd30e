package graft.streaming

import graft.SparkSpec
import graft.ops.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Multi-batch semantics of [[StreamingOps.driftHistogram]]: the
  * maintained histogram must equal the batch recompute after every
  * trigger, the TV finalize over the stream-maintained state must
  * equal the all-batch drift, and — the claim the scaladoc makes —
  * the operator's state must be bounded by days×bins (verified from
  * the query's own state-store metrics, not asserted on faith). */
class DriftStreamSpec extends SparkSpec {

  private val DayUs = 86400L * 1000000L
  private val BaseUs = // 2024-01-01 as epoch micros
    java.time.LocalDate.of(2024, 1, 1).toEpochDay * DayUs

  test("histogram equals batch recompute per trigger; state rows " +
      "bounded by days×bins; finalize equals all-batch drift") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Long, Double)]
    val events = in.toDF().toDF("event_id", "ts", "value")
    val q = StreamingOps.driftHistogram(events)
      .writeStream.format("memory").queryName("drift_hist_test")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: day 1 values in bins 0,0,1; day 2 in bin 9 (clamped)
      in.addData((1L, BaseUs, 10.0), (2L, BaseUs + 1L, 20.0),
        (3L, BaseUs + 2L, 60.0), (4L, BaseUs + DayUs, 9999.0))
      q.processAllAvailable()
      def hist() = spark.table("drift_hist_test")
        .collect().map(r => (r.getDate(0).toString, r.getLong(1),
          r.getLong(2))).toSet
      assert(hist() == Set(("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L),
        ("2024-01-02", 9L, 1L)))

      // batch 2: more day-1 bin-0, a new day 3 — counts accumulate
      in.addData((5L, BaseUs + 3L, 30.0),
        (6L, BaseUs + 2 * DayUs, 120.0))
      q.processAllAvailable()
      assert(hist() == Set(("2024-01-01", 0L, 3L), ("2024-01-01", 1L, 1L),
        ("2024-01-02", 9L, 1L), ("2024-01-03", 2L, 1L)))

      // the bounded-state claim, from the query's own metrics:
      // 3 days × ≤10 bins seen → at most 4 distinct (day, bin) keys
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      assert(state.head.numRowsTotal <= 4L,
        s"state rows ${state.head.numRowsTotal} exceed days×bins")

      // finalize over the stream-maintained histogram == all-batch TV
      val streamTv = Analytics.driftFromCounts(
          spark.table("drift_hist_test").localCheckpoint(),
          "day", "bin", "__c")
        .collect().map(r => (r.getDate(0).toString, r.getLong(1),
          r.getLong(2))).toSet
      val batchRows = Seq(
        ("2024-01-01", 0L), ("2024-01-01", 0L), ("2024-01-01", 1L),
        ("2024-01-02", 9L), ("2024-01-01", 0L), ("2024-01-03", 2L))
        .toDF("day_s", "bin")
        .select(org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("day_s")).as("day"),
          org.apache.spark.sql.functions.col("bin"))
      val batchTv = Analytics.distributionDriftTV(batchRows, "day", "bin")
        .collect().map(r => (r.getDate(0).toString, r.getLong(1),
          r.getLong(2))).toSet
      assert(streamTv == batchTv && streamTv.nonEmpty)
    } finally q.stop()
  }
}
