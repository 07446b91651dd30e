package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (fast single-query
    // re-verification while iterating; driver passes only two args)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, q) => (s, o, Some(q.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ObjectHashAggregate (min_by_obj dedup) falls back to
      // sort-based at 128 map entries by default — sized for
      // percentile-class buffers, far too small for one-row-per-key
      // dedup state (~200 B/entry; 256k entries ~= 50 MB/task)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // same inter-gate hygiene as Bench: gate-local localCheckpoint
    // blocks would otherwise accumulate in the block manager across
    // all 246 gates (cross-gate sharing is content-addressed tables
    // on disk, never in-memory blocks, so freeing them is safe)
    val baselineRdds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    // CONCURRENT dump (r14 verdict item 1/6: the driver's correctness
    // record was empty because the round's gate window ran out of
    // wall; each gate is an independent small Spark job that underuses
    // 32 cores, so a pool of 4 cuts the sweep toward its critical path
    // — same rationale as Bench's prepare pool, and same-store builds
    // stay serialized by StoreLedger's per-key locks). Gate-local
    // checkpoint blocks are freed at WAVE boundaries on this thread,
    // never per-gate from pool threads: a getPersistentRDDs id-delta
    // from one thread would unpersist a CONCURRENT gate's live
    // checkpoints (the round-13 CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
    // incident, documented in ops/Checkpoints.scala). Sequential
    // escape hatch: SPARK_GRAFT_VERIFY_POOL=1.
    val poolN = math.max(1,
      sys.env.get("SPARK_GRAFT_VERIFY_POOL").flatMap(_.toIntOption)
        .getOrElse(4))
    val gates = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    gates.grouped(4 * poolN).foreach { wave =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(poolN)
      wave.foreach { case (name, fn) =>
        pool.execute { () =>
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      }
      pool.shutdown()
      pool.awaitTermination(2, java.util.concurrent.TimeUnit.HOURS)
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baselineRdds.contains(id))
          try rdd.unpersist(blocking = false)
          catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
