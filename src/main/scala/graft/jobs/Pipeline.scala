package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.schemas.Schemas
import java.time.LocalDate

/** End-to-end pipeline orchestration — the Spark-native stand-in for
  * the reference's 17-task Airflow DAG (dags/pipeline.py:282-288):
  * plain function composition in dependency order; Spark's scheduler
  * supplies intra-job parallelism. Ingestion (Selenium/REST) is
  * out-of-engine — the contract starts at "files exist"
  * (SURVEY.md §1.4). */
object Pipeline {

  final case class Dims(districtCode: DataFrame, districtRegion: DataFrame,
                        townDistrict: DataFrame, agencyId: DataFrame)

  def readDims(spark: SparkSession, dir: String): Dims = Dims(
    spark.read.schema(Schemas.districtCode).parquet(s"$dir/district_code"),
    spark.read.schema(Schemas.districtRegion)
      .parquet(s"$dir/district_region"),
    spark.read.schema(Schemas.townDistrict).parquet(s"$dir/town_district"),
    spark.read.schema(Schemas.agencyId).parquet(s"$dir/agency_id"))

  /** The three transformation jobs + merge, composed. Returns the
    * conformed 28-column merged listings and the 17-column historical
    * table. */
  def run(spark: SparkSession, propnexJson: String, srxJson: String,
          historicalCsvDir: String, dims: Dims, runDate: LocalDate)
      : (DataFrame, DataFrame) = {
    val pn = PropnexJob.transform(PropnexJob.readRaw(spark, propnexJson),
      dims.districtCode, dims.districtRegion, runDate)
    val srx = SrxJob.transform(SrxJob.readRaw(spark, srxJson),
      dims.districtCode, dims.districtRegion, dims.agencyId, runDate)
    val merged = MergeDedupJob.transform(pn, srx, runDate)
    val hist = HistoricalJob.transform(
      HistoricalJob.readRaw(spark, historicalCsvDir),
      dims.districtCode, dims.districtRegion, dims.townDistrict)
    (merged, hist)
  }

  /** S5 — day-partitioned append sink: the Spark-native equivalent of
    * the reference's BigQuery DAY time-partitioned WRITE_APPEND tables
    * (dags/pipeline.py:225-272). Partition pruning on `partitionCol`
    * gives downstream readers partition elimination; at 100 TB this is
    * what makes "read yesterday" not "scan everything". */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)

  /** REPLAY-IDEMPOTENT day-partitioned sink — closes the replay
    * hazard the reference ships: its loads are WRITE_APPEND under
    * Airflow retries (dags/pipeline.py:246,258,271 + per-task
    * `retries`), so a load that dies after commit and is retried
    * double-appends the day's rows. Dynamic partition overwrite
    * replaces exactly the partitions PRESENT IN THIS BATCH: a retried
    * same-day load lands byte-identical (gate q_partition_replay
    * hash-pins re-run ≡ single run), other days' partitions are
    * untouched, and downstream readers keep the same pruned layout.
    * At 100 TB this is the difference between "retries are safe" and
    * "every retry needs a manual dedup pass". */
  def writePartitionedIdempotent(df: DataFrame, path: String,
                                 partitionCol: String): Unit = {
    val s = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "dynamic")
    try df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(path)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Bucketed managed-table sink: pre-shuffles rows into `buckets`
    * files by `bucketCol` so later equi-joins/aggregations on that key
    * read co-located data and plan with ZERO exchanges. The Spark
    * analogue of the clustered layout a warehouse would keep for its
    * hottest join key — at 100 TB, bucketing both fact tables on the
    * join key turns every subsequent join into a local zip of
    * pre-sorted buckets. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    graft.ops.Bucketing.writeBucketed(df, table, bucketCol, buckets,
      overwrite = true)

  /** RESUMABLE chain execution — the retry/skip/resume story the
    * reference delegates to Airflow (jobs trap everything to
    * sys.exit(1) and the DAG retries the task:
    * merge_dedup.py:67-68, dags/pipeline.py task `retries`): each
    * sink write is guarded by a per-step completion marker beside the
    * output (the Sinks.ensureBuilt pattern at file level), so a
    * re-run after a mid-chain death SKIPS finished sinks and resumes
    * at the first incomplete one. Death windows:
    *  - during a write → no marker; the retry re-runs the step, and
    *    the idempotent partition overwrite makes the second landing
    *    byte-identical (no double-append);
    *  - between write and marker → same as above: re-run is a no-op
    *    on the data, then the marker lands.
    * Returns the step names actually executed this invocation.
    * `onStepWritten` is a test seam, called after a step's write but
    * BEFORE its marker — throwing there simulates the second death
    * window (PipelineSpec kill-and-rerun). */
  def runResumable(spark: SparkSession, propnexJson: String,
                   srxJson: String, historicalCsvDir: String, dims: Dims,
                   runDate: LocalDate, outDir: String,
                   onStepWritten: String => Unit = _ => ()): Seq[String] = {
    val (merged, histOut) = run(spark, propnexJson, srxJson,
      historicalCsvDir, dims, runDate)
    val steps: Seq[(String, () => Unit)] = Seq(
      "scraped" -> (() => writePartitionedIdempotent(
        merged, s"$outDir/scraped", "transformed_date")),
      "historical" -> (() => writePartitionedIdempotent(
        histOut, s"$outDir/historical", "date_of_sale")))
    steps.flatMap { case (name, write) =>
      val marker = new java.io.File(outDir, s"_graft_done_$name")
      if (marker.exists()) None
      else {
        write()
        onStepWritten(name)
        marker.getParentFile.mkdirs()
        marker.createNewFile()
        Some(name)
      }
    }
  }

  /** CLI: <propnexJson> <srxJson> <historicalCsvDir> <dimsDir> <outDir>
    * [runDate]. Resumable: re-invoking after a failure completes the
    * remaining steps (see [[runResumable]]). */
  def main(args: Array[String]): Unit = {
    val Array(pn, srx, hist, dimsDir, outDir) = args.take(5)
    val runDate = args.lift(5).map(LocalDate.parse)
      .getOrElse(LocalDate.now())
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    runResumable(spark, pn, srx, hist, readDims(spark, dimsDir),
      runDate, outDir)
    spark.stop()
  }
}
