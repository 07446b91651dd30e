package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Incremental maintenance of aggregate materialized views — the
  * pattern that makes a 100 TB daily pipeline affordable: a full
  * re-aggregation re-reads the whole fact history every run, while
  * maintaining a per-group STATE table (count + sums, the
  * self-mergeable partial-aggregate algebra) costs one pass over the
  * NEW batch plus one group-sized merge, independent of history size.
  * The contract — `merge(state(hist), state(batch)) == state(hist ∪
  * batch)` — holds because count/sum are commutative monoids; averages
  * and other ratios are derived at READ time ([[finalizeView]]), never
  * stored, which is what keeps the state mergeable (an avg column
  * cannot be merged without its weight).
  *
  * This is the batch twin of Structured Streaming's partial-aggregate
  * state store, and the same shape Spark itself uses between map-side
  * and final aggregation — surfaced as a storable artifact API like
  * [[Similarity.nearDupPairsAgainstBuckets]] is for near-dup. */
object IncrementalAgg {

  /** Build the mergeable state for one batch: per-key `cnt` plus
    * `sum_<col>` for each value column (LONG inputs; callers convert
    * money to integer cents first — exact, associative, overflow-safe
    * far past 100 TB row counts for cent-scale values). One
    * partial-aggregable shuffle. */
  def aggState(batch: DataFrame, keys: Seq[String],
               valueCols: Seq[String]): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        valueCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Merge any number of state tables into one: union + re-sum. The
    * merge shuffles only GROUP cardinality rows per input — at 100 TB
    * with daily batches this is the difference between re-reading the
    * history and touching a few million state rows. */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state")
    val sumCols = states.head.columns.filterNot(keys.contains)
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).cast(LongType).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).cast(LongType).as(c)): _*)
  }

  /** Derive the read-time view from a state table: per-key cnt, sums,
    * and exact milli-unit means (`avg_<col>_milli` = sum·1000 div cnt
    * — integer floor division, engine-portable where a float avg is
    * not). */
  def finalizeView(state: DataFrame, keys: Seq[String]): DataFrame = {
    val sums = state.columns.filter(_.startsWith("sum_"))
    val avgs = sums.map(c =>
      expr(s"CAST((`$c` * 1000L) div cnt AS BIGINT)")
        .as(s"avg_${c.stripPrefix("sum_")}_milli"))
    state.select(keys.map(col) ++ Seq(col("cnt")) ++
      sums.map(col) ++ avgs: _*)
  }
}
