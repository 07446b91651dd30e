package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed storage for shuffle-free ("co-located") joins — the
  * layout-level answer to the biggest 100 TB cost in this engine:
  * repeated fact⋈fact equi-joins on the same key. Writing both tables
  * bucketed by the join key with the same bucket count pins each key
  * to one bucket file on each side, so every later join (or groupBy on
  * the key) reads the required hash distribution straight off storage
  * and the exchange disappears from the plan. One shuffle paid once at
  * write time, amortized over every downstream query — at 1000
  * executors this converts the nightly join from a full-network
  * shuffle into a local merge per bucket. */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and sorted) by `key`, one
    * file per bucket, and return the bucketed relation.
    *
    * `repartition(buckets, key)` first: Spark's bucket assignment and
    * its shuffle hash are the same Murmur3 function, so after the
    * repartition every task holds exactly one bucket's rows and the
    * writer emits ONE file per bucket — without it each task writes a
    * sliver of every bucket (tasks×buckets files), and the downstream
    * scan must merge-sort many fragments per bucket.
    *
    * With `overwrite = false` re-invocations in the same session reuse
    * the existing table (bucket metadata lives in the session catalog;
    * the driver harness builds a fresh session per run, which
    * rewrites); `overwrite = true` is the idempotent-overwrite sink
    * contract of the reference ([[graft.jobs.Pipeline.writeBucketed]]
    * delegates here with it). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, overwrite: Boolean = false): DataFrame = {
    val s = df.sparkSession
    if (overwrite || !s.catalog.tableExists(table)) {
      // the session catalog is in-memory: a previous SESSION may have
      // left the managed location on disk with no catalog entry, which
      // fails CTAS with LOCATION_ALREADY_EXISTS — clear both
      s.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      df.repartition(buckets, col(key))
        .write
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table)
    }
    s.table(table)
  }

  /** Equi-join two same-bucketed tables WITHOUT an exchange. The MERGE
    * hint stops the planner from "helpfully" broadcasting a small side
    * — the point of the layout is that NEITHER side moves, which is
    * the shape that survives both sides growing 1000×. A per-bucket
    * Sort remains in the plan (linear, over single-file buckets that
    * are already sorted): since Spark 3.0 bucketed scans only report
    * sorted output ordering under
    * `spark.sql.legacy.bucketedTableScan.outputOrdering`. */
  def bucketedJoin(s: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = s.table(leftTable).hint("merge")
    val r = s.table(rightTable).hint("merge")
    l.join(r, col(leftKey) === col(rightKey))
  }
}
