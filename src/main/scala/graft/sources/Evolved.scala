package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution reads — the day-2 problem of every long-lived
  * corpus store: snapshots written months apart differ by ADDED
  * columns (merge-fills null where absent) and RENAMED columns
  * (parquet has no rename — the bytes carry both names, each null in
  * the other's files; the read reconciles them).
  *
  * The layout contract: one snapshot per `snap=N` partition directory,
  * so the merged read is a single `mergeSchema` parquet scan whose
  * unified schema is the union of all snapshot schemas, and `snap`
  * rides along as an ordinary partition column (prunable when a query
  * wants one snapshot). Scale shape: mergeSchema pays a footer read
  * per file AT PLANNING TIME — bounded by file count, not data — and
  * the scan itself is an ordinary pruned parquet read. */
object Evolved {

  /** Merged read over every snapshot under `path`, with rename
    * reconciliation: for each `oldName -> newName`, the unified column
    * is `coalesce(newName, oldName)` (new files carry newName, old
    * files carry oldName — exactly one is non-null per row).
    *
    * A configured rename whose eras are not both present degrades
    * gracefully: if only the old name exists in the merged schema it
    * is aliased to the new name (a path holding only pre-rename
    * snapshots), if only the new name exists the row is passed through
    * (all snapshots post-rename), and if neither exists the rename is
    * ignored — referencing both unconditionally would throw
    * AnalysisException on single-era subsets. */
  def readMerged(s: SparkSession, path: String,
                 renames: Map[String, String] = Map.empty): DataFrame = {
    val merged = s.read.option("mergeSchema", "true").parquet(path)
    renames.foldLeft(merged) { case (df, (oldName, newName)) =>
      val cols = df.columns.toSet
      (cols.contains(oldName), cols.contains(newName)) match {
        case (true, true) =>
          df.withColumn(newName, coalesce(col(newName), col(oldName)))
            .drop(oldName)
        case (true, false) => df.withColumnRenamed(oldName, newName)
        case _             => df
      }
    }
  }
}
