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

  private val MinUs = 60L * 1000000L // one minute in micros
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
      val in = MemoryStream[(Long, Long)] // (user_id, ts micros)
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
        in.addData((1L, BaseUs), (1L, BaseUs + 100L * MinUs),
          (2L, BaseUs + 50L * MinUs), (2L, BaseUs + 90L * MinUs))
        q.processAllAvailable()
        assert(table() == Seq((1L, BaseUs, BaseUs, 1L)))
        // batch 2 — user 2's +70min bridges 50..50 and 90..90 into ONE
        // session (emitting on in-batch gap evidence would have split
        // it — the exact bug the watermark-close rule prevents);
        // user 3's +200min pushes the watermark to +140min, closing
        // user 1's second session and user 2's bridged one.
        in.addData((2L, BaseUs + 70L * MinUs), (3L, BaseUs + 200L * MinUs))
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

  /** Reference model: batch gaps-islands sessionization, keeping the
    * sessions closed before the final watermark — the same recipe the
    * DuckDB oracle runs, in Scala, on data the processor never saw. */
  private def expectedSessions(evts: Seq[(Long, Long)]) // (user, ts us)
      : Seq[(Long, Long, Long, Long)] = {
    val maxUs = evts.map(_._2).max
    val wmUs = (maxUs / 1000 - 3600000L) * 1000L
    evts.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ts = es.map(_._2).sorted
      val sessions = ts.tail.foldLeft(
        List((ts.head, ts.head, 1L))) { case (acc, t) =>
        val (st, en, n) = acc.head
        if (t - en <= GapUs) (st, math.max(en, t), n + 1) :: acc.tail
        else (t, t, 1L) :: acc
      }.reverse
      sessions.filter { case (_, en, _) => en + GapUs <= wmUs }
        .map { case (st, en, n) => (u, st, en, n) }
    }.sorted
  }

  test("fuzz: processor equals batch sessions closed before final " +
      "watermark (minute grid hits the ms-aligned close boundary)") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      for (seed <- Seq(1L, 12L, 23L)) {
        val rnd = new scala.util.Random(seed)
        // minute-granular times: exact 30-min gaps occur, and each of
        // these seeds was CHECKED to contain >=1 session whose close
        // time equals the final watermark exactly - pinning the
        // <=-boundary and the ceil-division timer registration
        val evts = Seq.fill(200)((1L + rnd.nextInt(8),
          BaseUs + rnd.nextInt(12 * 60) * MinUs))
        // two batches split at the time median: batch 2's rows all sit
        // above batch 1's watermark, so none are late-dropped and the
        // batch reference model stays exact
        val sorted = evts.sortBy(_._2)
        val (b1, b2) = sorted.splitAt(sorted.length / 2)
        val in = MemoryStream[(Long, Long)]
        val out = StreamingOps.sessionState(
          in.toDF().toDF("user_id", "ts"), GapUs).toDF()
        val q = out.writeStream.format("memory")
          .queryName(s"sess_fuzz_$seed").outputMode("append")
          .trigger(Trigger.ProcessingTime(0)).start()
        try {
          in.addData(b1); q.processAllAvailable()
          in.addData(b2); q.processAllAvailable()
          val got = spark.table(s"sess_fuzz_$seed").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              r.getLong(3))).toSeq.sorted
          assert(got == expectedSessions(evts), s"seed=$seed")
        } finally q.stop()
      }
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
