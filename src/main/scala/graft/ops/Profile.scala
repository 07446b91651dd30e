package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column-level data profiling: per-column null and distinct counts in
  * ONE pass over the data (a single Aggregate computing 2·N aggregate
  * expressions — not N separate jobs), unpivoted to long format.
  * The quality gate a training-data pipeline runs before ingesting a
  * new source at 100 TB: one scan, partial-aggregable, no shuffle of
  * the raw rows. */
object Profile {

  /** (column, n_rows, n_nulls, n_distinct) per profiled column.
    * n_distinct is exact; pass `approx = true` to use HLL
    * (approx_count_distinct) when exactness isn't worth the memory at
    * scale. */
  def profileColumns(df: DataFrame, cols: Seq[String],
                     approx: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        (if (approx) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__distinct_$c"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot via stack: one row per column
    val stackArgs = cols.map(c =>
      s"'$c', __nulls_$c, __distinct_$c").mkString(", ")
    wide.selectExpr("__rows",
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, n_distinct)")
      .select(col("column_name"), col("__rows").as("n_rows"),
        col("n_nulls"), col("n_distinct"))
  }
}
