package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

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

  /** STORAGE-LEVEL POLICY for localCheckpoints (r13 verdict item 2,
    * pinned by `CheckpointPolicySpec`):
    *
    *  - Bare `localCheckpoint()` (deserialized MEMORY_AND_DISK) is
    *    reserved for frames that are BOTH bounded-or-linear in row
    *    count AND narrow (fixed-width numeric columns — entity/pair
    *    vectors, edge lists, bounded aggregates). Their deserialized
    *    footprint is a few dozen bytes per row and iterative
    *    consumers re-read them every round, so deserialized blocks
    *    are the right trade.
    *  - Any checkpoint of a frame carrying CORPUS PAYLOAD
    *    (variable-width text / array columns) or super-linear row
    *    counts must use [[spill]] instead: serialized blocks cap the
    *    storage-pool claim at the compact binary size and overflow to
    *    disk, leaving the unified-memory execution half free. Round
    *    13's sf10 sweep is the measured failure of breaking this:
    *    duel-sized deserialized checkpoints in the preference gates
    *    starved hash aggregation under -Xmx48g
    *    (AGGREGATE_OUT_OF_MEMORY) where the pair matrix — or a
    *    serialized level — sails through. */
  def spill(df: DataFrame): DataFrame =
    df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)

  /** Materialize an ITERATION-STATIC frame hash-partitioned on `key`
    * so every per-iteration aggregate (or equi-join) keyed on it runs
    * EXCHANGE-FREE: the fixed-iteration fits (BradleyTerry,
    * RankCentrality, PageRank, KCore's peel) aggregate the big static
    * side by the same key every round, and without a pinned
    * partitioning each round pays one shuffle + its AQE stage jobs.
    *
    * Why persist and not localCheckpoint: a checkpoint's scan reports
    * `UnknownPartitioning` — measured round 16 (`tools.PlanPeek`):
    * `repartition(col).localCheckpoint()` still plans `Exchange` above
    * the partial aggregate, which is why the earlier "explicit
    * hash-partition of the edges cost a shuffle and bought nothing"
    * A/B (PageRank r11 note) saw no win — it paid the repartition and
    * then lost the partitioning in the checkpoint. A persisted
    * InMemoryRelation KEEPS the cached plan's output partitioning
    * (AQE does not re-number cached-plan partitions by default:
    * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` is
    * false), so one upfront hash shuffle buys `iters` exchange-free
    * rounds — the trade that wins whenever iters ≥ 2.
    *
    * Deserialized MEMORY_AND_DISK (the persist default) is correct
    * here per the storage-level policy above: these are the narrow
    * bounded/linear numeric frames (pair matrices, edge lists).
    * Lazy by design — the first consumer materializes it; Bench's
    * per-gate cleanup unpersists it with the other gate-local blocks.
    * Skew note: a hub key concentrates its rows in one cached
    * partition and AQE cannot split a cached side; acceptable for
    * the bounded-degree graphs here — salt the key upstream if a
    * deployment's graph carries mega-hubs. */
  def pinPartitioned(df: DataFrame, key: String): DataFrame =
    // dev-only A/B toggle (host noise makes cross-session timing
    // untrustworthy — ±30%+ observed; a runtime property lets one JVM
    // interleave pinned/unpinned reps): -Dgraft.pin.disable=1 falls
    // back to the old localCheckpoint shape. Results are identical
    // either way; never set by the driver contract.
    if (System.getProperty("graft.pin.disable", "") == "1")
      df.localCheckpoint()
    else
      df.repartition(org.apache.spark.sql.functions.col(key)).persist()

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
