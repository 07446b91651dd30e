package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Rendezvous (highest-random-weight) sharding — stable storage
  * assignment for a corpus spread over N stores: each key goes to the
  * shard minimizing md5(key ':' shard), so removing a shard relocates
  * ONLY that shard's keys (consistent hashing's guarantee without ring
  * maintenance; Thaler & Ravishankar 1998). Reference scope: none
  * (single-machine reference); LLM-pipeline brief — shard-stable
  * layout is what keeps a 100 TB re-balance from touching every file.
  *
  * Pure per-row expression over a literal shard list (bounded by the
  * fleet size): no shuffle, no state; md5-over-string is bit-identical
  * across engines so a SQL oracle pins assignments exactly. */
object Sharding {

  /** The winning shard id for `key` over `shards` — min (md5 weight,
    * shard) struct, ties (impossible in practice, defined anyway) to
    * the smaller shard id. */
  def rendezvousShard(key: Column, shards: Seq[Int]): Column = {
    require(shards.nonEmpty, "rendezvousShard needs at least one shard")
    array_min(array(shards.map { sh =>
      struct(md5(concat(key.cast(StringType), lit(":" + sh))).as("w"),
        lit(sh).as("shard"))
    }: _*)).getField("shard").cast(LongType)
  }
}
