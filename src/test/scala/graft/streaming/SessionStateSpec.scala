package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Multi-batch semantics of [[StreamingOps.SessionProcessor]] that the
  * bounded single-file oracle run cannot reach: a timer firing
  * mid-stream (extra no-data batch after the watermark advances),
  * cross-batch session bridging (a later event coalescing two
  * candidate sessions whose gap was never watermark-confirmed), and
  * watermark-withheld trailing sessions.
  *
  * Times sit on a +24 h base: the stateful operator's late-record
  * filter drops rows at-or-below the current watermark, and the
  * initial watermark is 0 — an event at exactly t=0 would be
  * discarded before reaching the processor (real event timestamps are
  * always far above epoch 0). */
class SessionStateSpec extends SparkSpec {

  private val MinNs = 60L * 1000000000L // one minute in nanos
  private val MinUs = 60L * 1000000L    // one minute in micros
  private val BaseNs = 24L * 60L * MinNs
  private val BaseUs = 24L * 60L * MinUs
  private val GapUs = 30L * MinUs       // 30-minute session gap

  test("mid-stream close, cross-batch bridging, trailing withheld") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val in = MemoryStream[(Long, Long)] // (user_id, ts nanos)
      val events = in.toDF().toDF("user_id", "ts")
      val out = StreamingOps.sessionState(events, GapUs).toDF()
      val q = out.writeStream.format("memory")
        .queryName("sess_test").outputMode("append")
        .trigger(Trigger.ProcessingTime(0)).start()
      try {
        def table() = spark.table("sess_test")
          .orderBy("user_id", "session_start_us").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSeq
        // batch 1 — user 1: t=+0 and t=+100min; the watermark moves to
        // +40min after the batch, so the extra timer batch closes the
        // first session MID-STREAM. user 2: candidates at +50min and
        // +90min, both close times beyond +40min — still open.
        in.addData((1L, BaseNs), (1L, BaseNs + 100L * MinNs),
          (2L, BaseNs + 50L * MinNs), (2L, BaseNs + 90L * MinNs))
        q.processAllAvailable()
        assert(table() == Seq((1L, BaseUs, BaseUs, 1L)))
        // batch 2 — user 2's +70min bridges 50..50 and 90..90 into ONE
        // session (emitting on in-batch gap evidence would have split
        // it — the exact bug the watermark-close rule prevents);
        // user 3's +200min pushes the watermark to +140min, closing
        // user 1's second session and user 2's bridged one.
        in.addData((2L, BaseNs + 70L * MinNs), (3L, BaseNs + 200L * MinNs))
        q.processAllAvailable()
        assert(table() == Seq(
          (1L, BaseUs, BaseUs, 1L),
          (1L, BaseUs + 100L * MinUs, BaseUs + 100L * MinUs, 1L),
          (2L, BaseUs + 50L * MinUs, BaseUs + 90L * MinUs, 3L)))
        // user 3's +200min session stays open: close time +230min is
        // past the final +140min watermark
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
