package graft.ops

import org.apache.spark.sql.DataFrame

/** Freeing `localCheckpoint()` storage deterministically.
  *
  * `Dataset.unpersist()` is a NO-OP for a checkpointed Dataset: the
  * checkpoint RDD's persistence is registered on the RDD itself, not
  * through the Dataset's CacheManager entry, so the blocks stay pinned
  * until the RDD is garbage-collected — and a checkpoint taken during
  * SETUP (before Bench captures its session-baseline RDD set) is then
  * treated as baseline scaffolding and survives the whole session
  * (round-12 advice, `Tombstones.recordAll`).
  *
  * The fix frees the EXACT RDD backing the checkpointed frame (its
  * plan is a `LogicalRDD` holding it) — never a `getPersistentRDDs`
  * id-delta, which under Bench's parallel prepare pool would unpersist
  * a CONCURRENT prepare's live checkpoints (observed:
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND in pref_score_store while
  * cross_takedown_stores' cleanup ran, round 13). */
object Checkpoints {

  /** Unpersist the checkpoint blocks behind `df` (a frame returned by
    * `localCheckpoint()`). Safe on any frame: a plan that is not a
    * checkpoint scan is left untouched. */
  def free(df: DataFrame): Unit =
    try df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case _: Throwable => () }
}
