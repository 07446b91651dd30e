package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming-vs-batch parity on the REAL fixture: every stateful /
  * event-time streaming gate runs through its actual registry entry at
  * sf0.001 and must equal a Spark-batch twin of its oracle, value for
  * value. This is the builder-loop half of the DuckDB gate: a
  * streaming query that silently wrong-answers (the micros-as-nanos
  * 1000× compression produced 10 rows where the oracle had 3,385, or
  * 0 where it had 9,525) fails HERE, not first in the driver's
  * verify. Row counts alone are asserted non-empty too — the original
  * failure mode included empty and near-empty results. */
class StreamBatchParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val GapUs = 1800L * 1000000L

  private def ev: DataFrame = Tables.events(spark, sf)
  private def cents = floor(col("value") * 100 + 0.5).cast(LongType)

  private def gate(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  private def canon(df: DataFrame, cols: Seq[String]): Seq[Seq[String]] =
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("\u0000")))
      .sortBy(_.mkString("|"))

  private def assertParity(name: String, batch: DataFrame): Unit = {
    val s = gate(name)
    val cols = s.columns.toSeq
    val a = canon(s, cols)
    val b = canon(batch, cols)
    assert(a.nonEmpty, s"$name: streaming result is EMPTY")
    assert(a.size == b.size,
      s"$name: ${a.size} streaming rows vs ${b.size} batch rows")
    assert(a == b, s"$name: values differ from the batch twin")
  }

  // final watermark the bounded run settles at: ms-truncated max
  // event time minus the 1 h delay, back in micros — the same recipe
  // the oracles replay
  private def finalWatermarkUs(of: DataFrame): Long = {
    val maxUs = of.agg(max(col("ts"))).head().getLong(0)
    (maxUs / 1000 - 3600000L) * 1000L
  }

  test("q_stream_windowed_counts equals batch hourly aggregate") {
    assertParity("q_stream_windowed_counts",
      ev.groupBy(
          unix_micros(date_trunc("hour", timestamp_micros(col("ts"))))
            .as("window_start_us"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(cents).as("sum_value_c")))
  }

  test("q_stream_dedup_counts equals batch distinct-user counts") {
    assertParity("q_stream_dedup_counts",
      ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users")))
  }

  private def viewsAndClicks: (DataFrame, DataFrame) = {
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("ts").as("click_ts_us"))
    (v, c)
  }

  test("q_stream_stream_join equals batch time-range join") {
    val (v, c) = viewsAndClicks
    assertParity("q_stream_stream_join",
      v.join(c, col("user_id") === col("c_user") &&
          col("click_ts_us") >= col("view_ts_us") &&
          col("click_ts_us") <= col("view_ts_us") + GapUs)
        .select(col("user_id"), col("view_id"), col("click_id"),
          (col("click_ts_us") - col("view_ts_us")).as("lag_us")))
  }

  test("q_stream_stream_outer adds exactly the watermark-proven " +
      "unmatched views") {
    val (v, c) = viewsAndClicks
    val wmUs = math.min(
      finalWatermarkUs(ev.filter(col("event_type") === "view")),
      finalWatermarkUs(ev.filter(col("event_type") === "click")))
    val matched = v.join(c, col("user_id") === col("c_user") &&
        col("click_ts_us") >= col("view_ts_us") &&
        col("click_ts_us") <= col("view_ts_us") + GapUs)
      .select(col("user_id"), col("view_id"), col("click_id"),
        (col("click_ts_us") - col("view_ts_us")).as("lag_us"))
    val unmatched = v
      .join(matched.select(col("view_id").as("m_id")).distinct(),
        col("view_id") === col("m_id"), "left_anti")
      .filter(col("view_ts_us") + GapUs < wmUs)
      .select(col("user_id"), col("view_id"),
        lit(null).cast(LongType).as("click_id"),
        lit(null).cast(LongType).as("lag_us"))
    assertParity("q_stream_stream_outer", matched.unionByName(unmatched))
  }

  test("q_stream_static_join equals batch dim enrich") {
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("cohort", pmod(col("user_id"), lit(5L)))
    assertParity("q_stream_static_join",
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("ts_us"))
        .join(dim, "user_id"))
  }

  test("q_stream_cdc_snapshot equals batch latest-per-key") {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    assertParity("q_stream_cdc_snapshot",
      ev.select(col("user_id"), col("event_type"),
          col("ts").as("ts_us"), col("event_id"), cents.as("value_c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn"))
  }

  test("q_stream_user_stats equals batch per-user stats") {
    assertParity("q_stream_user_stats",
      ev.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), max(cents).as("max_value_c")))
  }

  test("q_stream_incr_agg equals batch full recompute") {
    assertParity("q_stream_incr_agg",
      ev.filter(col("value").isNotNull)
        .select(col("user_id"), cents.as("v_c"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"), sum(col("v_c")).as("sum_value_c"))
        .withColumn("avg_value_c_milli",
          expr("(sum_value_c * 1000) div cnt")))
  }

  test("q_stream_neardup equals the daily incremental near-dup gate") {
    // the two faces of the incremental path share one operator and
    // one store; the streaming face must reproduce the batch face
    // pair for pair, jaccard for jaccard
    assertParity("q_stream_neardup", gate("q_incr_neardup"))
  }

  test("q_stream_drift_tv equals all-batch drift") {
    val batchRows = ev.filter(col("value").isNotNull)
      .select(to_date(timestamp_micros(col("ts"))).as("day"),
        least(lit(9L), floor(col("value") / 50).cast(LongType)).as("bin"))
    assertParity("q_stream_drift_tv",
      graft.ops.Analytics.distributionDriftTV(batchRows, "day", "bin"))
  }

  test("q_stream_session_state equals batch sessions closed before " +
      "the final watermark") {
    val wmUs = finalWatermarkUs(ev)
    val wOrd = Window.partitionBy("user_id").orderBy("ts")
    val batch = ev.select(col("user_id"), col("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_s",
        when(col("prev").isNull ||
          col("ts") - col("prev") > GapUs, 1L).otherwise(0L))
      .withColumn("seq", sum(col("new_s")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seq")
      .agg(min(col("ts")).as("session_start_us"),
        max(col("ts")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .filter(col("session_end_us") + GapUs <= wmUs)
      .drop("seq")
    assertParity("q_stream_session_state", batch)
  }
}
