package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._
import graft.ops.Merge

/** Incremental-maintenance queries: upsert, CDC merge-apply, SCD2
  * history (ops/Merge.scala). The reference pipeline overwrites its
  * snapshot daily (merge_dedup.py:31-41); these are the operators that
  * replace full rewrites once the data outgrows them.
  *
  * events.ts is epoch-NANOS int64 on both sides (Tables.events +
  * DuckDB epoch_ns) — exact, no timestamp-precision drift. */
object MergeQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100 + 0.5).cast(LongType)
  private val centsSql = (e: String) =>
    s"CAST(floor(($e) * 100 + 0.5) AS BIGINT)"

  def all: Seq[Q] = Seq(

    // ---- upsert: delta batch replaces/extends the snapshot ------------
    // Deterministic synthetic delta from customer itself: every 10th
    // key gets a segment overwrite, every (10k+1)th key re-keyed past
    // the max becomes an insert.
    Q("q_merge_upsert",
      (s, d) => {
        val snap = customer(s, d).select("c_custkey", "c_mktsegment")
        val updates = snap.filter(col("c_custkey") % 10 === 0)
          .withColumn("c_mktsegment", lit("UPDATED"))
        val inserts = snap.filter(col("c_custkey") % 10 === 1)
          .withColumn("c_custkey", col("c_custkey") + 1000000L)
        Merge.upsert(snap, updates.unionByName(inserts),
            keys = Seq("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""
        |WITH delta AS (
        |  SELECT c_custkey, 'UPDATED' AS c_mktsegment FROM customer
        |  WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_mktsegment FROM customer
        |  WHERE c_custkey % 10 = 1)
        |SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT c_custkey FROM delta)
        |UNION ALL
        |SELECT c_custkey, c_mktsegment FROM delta
        |ORDER BY c_custkey
        |""".stripMargin.trim)),

    // ---- CDC merge-apply: latest change per key wins, deletes drop ----
    // Snapshot = each user's first signup; change log = purchases
    // (upserts) and errors (deletes), ordered by (ts, event_id). The
    // change log compacts via ONE max_by_obj shuffle before touching
    // the snapshot.
    Q("q_cdc_merge_apply",
      (s, d) => {
        val ev = events(s, d)
        val snap = ev.filter(col("event_type") === "signup")
          .groupBy("user_id")
          .agg(min(struct(expr("ts div 1000").as("ts_us"),
            col("event_id"),
            cents(col("value")).as("value_c"))).as("f"))
          .select(col("user_id"), col("f.event_id").as("event_id"),
            col("f.value_c").as("value_c"))
        // micros ordering on both sides (oracle rule 5): DuckDB windows
        // can only see micro-precision ts, so latest-change selection
        // must use the same truncation here
        val changes = ev
          .filter(col("event_type").isin("purchase", "error"))
          .select(col("user_id"), col("event_id"),
            cents(col("value")).as("value_c"),
            expr("ts div 1000").as("ts_us"),
            when(col("event_type") === "error", lit("D"))
              .otherwise(lit("U")).as("op"))
        Merge.applyCdc(snap, changes, keys = Seq("user_id"),
            ordCols = Seq("ts_us", "event_id"), opCol = "op")
          .orderBy("user_id")
      },
      Some(s"""
        |WITH snap AS (
        |  SELECT user_id, event_id, value_c FROM (
        |    SELECT user_id, event_id,
        |      ${centsSql("value")} AS value_c,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts), event_id) AS rn
        |    FROM events WHERE event_type = 'signup')
        |  WHERE rn = 1),
        |ch AS (
        |  SELECT user_id, event_id, ${centsSql("value")} AS value_c,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |latest AS (SELECT user_id, event_id, value_c, op FROM ch
        |           WHERE rn = 1)
        |SELECT user_id, event_id, value_c FROM snap
        |WHERE user_id NOT IN (SELECT user_id FROM ch)
        |UNION ALL
        |SELECT user_id, event_id, value_c FROM latest WHERE op <> 'D'
        |ORDER BY user_id
        |""".stripMargin.trim)),

    // ---- SCD2: version log → validity intervals -----------------------
    // ts truncated to MICROS before the window: DuckDB timestamps are
    // micro-precision, so ordering and interval bounds must be computed
    // on the same truncated values on both sides (oracle rule 5).
    Q("q_scd2_history",
      (s, d) => Merge.scd2(
          events(s, d).filter(col("event_type") === "purchase")
            .select(col("user_id"), col("event_id"),
              cents(col("value")).as("value_c"),
              expr("ts div 1000").as("ts_us")),
          keys = Seq("user_id"), effCol = "ts_us",
          tiebreak = Seq("event_id"))
        .drop("ts_us")
        .orderBy("user_id", "valid_from", "event_id"),
      Some(s"""
        |SELECT user_id, event_id, ${centsSql("value")} AS value_c,
        |  epoch_us(ts) AS valid_from,
        |  lead(epoch_us(ts)) OVER w AS valid_to,
        |  CASE WHEN lead(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END
        |    AS is_current
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, valid_from, event_id
        |""".stripMargin.trim))
  )
}
