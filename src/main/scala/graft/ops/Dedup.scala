package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Completeness-based entity dedup — the reference's flagship semantics
  * (jobs/spark/merge_dedup.py:14-29): rows agreeing on a business key
  * are the same entity; keep the single most-complete row (fewest
  * NULLs).
  *
  * Scale notes (100 TB): this is ONE hash-partition shuffle on the key
  * + an intra-partition sort — the minimal plan for this semantics
  * (`Exchange hashpartitioning → Sort → WindowExec → Filter`). Skewed
  * keys (one location/price bucket with millions of rows) are handled
  * by AQE skew mitigation only for joins, not windows — if a key is
  * known-hot, pre-aggregate with `min_by` instead (see
  * [[keepMostCompleteAgg]], which is shuffle-equal but avoids the full
  * sort and is the preferred 100 TB path). */
object Dedup {

  /** A1 (merge_dedup.py:21-22) — horizontal null count: an N-ary
    * projection `Σ when(isNull,1,0)`, not an aggregate. */
  def nullCount(cols: Seq[Column]): Column =
    cols.map(c => when(c.isNull, lit(1)).otherwise(lit(0)))
      .reduce(_ + _)

  /** W1+F2 (merge_dedup.py:20-29) — window row_number dedup.
    * The reference orders by null_count only, leaving ties
    * nondeterministic; `tiebreak` columns make the kept row stable so
    * the DuckDB oracle can match (SURVEY §7.4). */
  def keepMostComplete(df: DataFrame, keys: Seq[String],
                       tiebreak: Seq[String],
                       countedCols: Option[Seq[String]] = None): DataFrame = {
    val counted = countedCols.getOrElse(df.columns.toIndexedSeq)
    val withNc = df.withColumn("__null_count", nullCount(counted.map(col)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("__null_count").asc +: tiebreak.map(col(_).asc)): _*)
    withNc.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__null_count")
  }

  /** Same semantics as [[keepMostComplete]] via a min-by aggregate over
    * a packed (null_count, tiebreak) ordering struct. One
    * partial-aggregable shuffle, no sort, no row_number — the 100 TB
    * path: map-side combine means each executor ships at most one
    * candidate row per key per partition instead of every duplicate.
    *
    * Uses [[graft.functions.MinByObj]], not the built-in `min_by`: the
    * declarative min_by keeps its struct arguments in the aggregation
    * buffer, struct buffers aren't HashAggregate-mutable, and the plan
    * silently degrades to SortAggregateExec — a full sort on BOTH sides
    * of the shuffle, precisely what this formulation exists to avoid.
    * The typed-imperative twin runs in ObjectHashAggregateExec. */
  def keepMostCompleteAgg(df: DataFrame, keys: Seq[String],
                          tiebreak: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val counted = df.columns.toIndexedSeq
    val ord = struct(
      (nullCount(counted.map(col)).as("nc") +: tiebreak.map(col)): _*)
    val packed = struct(counted.map(col): _*)
    // build the structs in a codegen'd Project BELOW the aggregate:
    // a typed-imperative update() evaluates its argument expressions
    // interpreted per row, so handing it CreateStruct trees would undo
    // the sort-free win — handing it two ready attributes keeps the
    // per-row work whole-stage-compiled
    val out = df
      .withColumn("__ord", ord).withColumn("__packed", packed)
      .groupBy(keys.map(col): _*)
      .agg(call_function("min_by_obj", col("__packed"), col("__ord"))
        .as("__row"))
      .select(counted.map(c => col(s"__row.$c").as(c)): _*)
    out
  }

  /** Exact duplicate removal at content granularity: group on a
    * fingerprint of `contentCols`, keep the row with the smallest
    * tiebreak. Backbone of the exact-dedup stage of a training-data
    * pipeline; one shuffle, partial-aggregable. */
  def exactDedup(df: DataFrame, contentCols: Seq[String],
                 tiebreak: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    // hash an UNAMBIGUOUS encoding: concat_ws skips NULLs (NULL vs ''
    // collide) - to_json(struct) preserves column boundaries, quoting,
    // and null-vs-empty distinctions
    val fp = sha2(to_json(struct(contentCols.map(col): _*)), 256)
    val counted = df.columns.toIndexedSeq
    val packed = struct(counted.map(col): _*)
    df.withColumn("__fp", fp)
      .groupBy(col("__fp"))
      // min_by_obj, not min_by: ObjectHashAggregate vs SortAggregate
      // (see keepMostCompleteAgg)
      .agg(call_function("min_by_obj", packed,
        struct(tiebreak.map(col): _*)).as("__row"))
      .select(counted.map(c => col(s"__row.$c").as(c)): _*)
  }
}
