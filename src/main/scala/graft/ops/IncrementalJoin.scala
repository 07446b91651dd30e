package graft.ops

import org.apache.spark.sql.DataFrame

/** Incremental maintenance of JOIN materialized views — the delta-join
  * companion to [[IncrementalAgg]]: a materialized A ⋈ B over 100 TB
  * facts cannot be recomputed per batch, but under inserts it updates
  * with the classic three-term delta expansion
  *
  *   J_new = J_old ∪ (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * where every new term probes with a DELTA-sized side — the big
  * relations are only ever the build/probe target of a small batch,
  * never re-joined against each other. With the stored sides bucketed
  * on the join keys ([[Bucketing]]) the two cross terms are
  * exchange-free on the big side; ΔA ⋈ ΔB is delta × delta. Inserts
  * only, by contract: updates/deletes go through [[Merge.applyCdc]]
  * compaction BEFORE view maintenance, the standard CDC-then-maintain
  * layering. */
object IncrementalJoin {

  /** The maintained inner equi-join after one insert batch on each
    * side (either delta may be empty). `jOld` must be exactly
    * `aOld ⋈ bOld` on `keys` with the same column set the deltas
    * produce; the result is J over (aOld ∪ dA) ⋈ (bOld ∪ dB), which
    * the gate's full-recompute oracle pins. */
  def deltaJoinInserts(jOld: DataFrame, aOld: DataFrame, dA: DataFrame,
                       bOld: DataFrame, dB: DataFrame,
                       keys: Seq[String]): DataFrame =
    jOld
      .unionByName(dA.join(bOld, keys))
      .unionByName(aOld.join(dB, keys))
      .unionByName(dA.join(dB, keys))
}
