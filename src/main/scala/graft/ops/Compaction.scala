package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Small-file compaction — the table-maintenance operator every
  * append-heavy lake needs: streaming sinks and per-batch appends
  * leave thousands of KB-sized files, and at 100 TB the scan cost
  * becomes file-OPEN bound (footer reads, scheduler tasks) rather
  * than byte bound. Compaction rewrites a directory into files of a
  * target size: list the input once to measure bytes, round-robin
  * repartition to `ceil(bytes / target)` even output files, write
  * once. No shuffle key — round-robin gives equal-sized files without
  * assuming any distribution of the data. */
object Compaction {

  /** Total bytes of the parquet data files under `path`. */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }

  /** Rewrite the parquet directory at `inPath` into
    * `ceil(inputBytes / targetBytes)` similarly-sized files at
    * `outPath` and return the compacted relation. Idempotent per
    * outPath (skips when _SUCCESS exists — content-keyed out paths
    * make staleness the caller's contract). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(outPath, "_SUCCESS"))) {
      val bytes = dataBytes(spark, inPath)
      val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      spark.read.parquet(inPath)
        .repartition(nFiles)
        .write.mode("overwrite").parquet(outPath)
    }
    spark.read.parquet(outPath)
  }
}
