package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Sum of all collectors' accumulated STW time — per-gate deltas
    * attribute "was this gate slow, or was the JVM collecting". */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  private def usedHeapMb(): Double = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / 1048576.0
  }

  /** GATE WATCHDOG (r14 post-mortem): the r14 sf10 full-registry sweep
    * wedged for 4.5+ h inside ONE gate — seven executor threads
    * spinning at 100% CPU in a codegen'd hash aggregate, the main
    * thread blocked in AQE's stage-event wait — and the whole sweep
    * (and the round's artifact) died with it. One pathological gate
    * must cost its own timeout, not the sweep: when
    * SPARK_GRAFT_GATE_TIMEOUT_SEC is set, a gate still running after
    * that many seconds has its job group cancelled
    * (interrupt-on-cancel), which fails the query into the existing
    * failed[]/errors{} accounting and lets the sweep continue. Tasks
    * that ignore interruption (a tight generated loop) are abandoned
    * as zombies — the scheduler still fails the job, so the loop
    * advances; the watchdog line in stderr records the abandonment.
    * Unset (the driver contract) nothing changes. */
  private def withGateWatchdog(spark: SparkSession, name: String,
                               timeoutSec: Option[Int])
                              (body: => Unit): Unit =
    timeoutSec match {
      case None => body
      case Some(t) =>
        val sc = spark.sparkContext
        val group = s"gate:$name"
        sc.setJobGroup(group, s"bench gate $name (watchdog ${t}s)",
          interruptOnCancel = true)
        val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
        val timer = new java.util.Timer(s"gate-watchdog", true)
        timer.schedule(new java.util.TimerTask {
          def run(): Unit = {
            fired.set(true)
            System.err.println(
              s"[bench] $name WATCHDOG fired after $t s - cancelling " +
                "job group (zombie tasks, if any, are abandoned)")
            try sc.cancelJobGroup(group) catch { case _: Throwable => () }
          }
        }, t * 1000L)
        try {
          body
          // completed only because the cancel raced the finish — the
          // gate still exceeded its budget; record it as a failure,
          // not a timing
          if (fired.get) throw new RuntimeException(
            s"gate exceeded ${t}s watchdog (cancelled)")
        } finally { timer.cancel(); sc.clearJobGroup() }
    }

  /** 1-minute system load average — the contention witness. Round 14's
    * "confirmed" dedup regression was host contention (a 4.2 h builder
    * sweep covered the driver's whole bench window, so even second-run
    * adjudication ran loaded and the context/regressed split failed);
    * a quiet-box A/B reproduced every gate in-band. Recording load per
    * gate makes the next such episode self-attributing. -1 when the
    * platform bean cannot report it. */
  private def loadAvg1(): Double =
    try java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** Shared flag thresholds (r12 advice): the flagging rules below and
    * the second-run `inBand` adjudication must always apply the SAME
    * margins, so they are hoisted here instead of re-hardcoded at each
    * site. Single-baseline is looser (1.5×) than band-exit (1.25×)
    * because a band already absorbs the host's run-to-run spread. */
  private[graft] val BaselineRatio = 1.5
  private[graft] val BandRatio = 1.25
  private[graft] val AbsSecFloor = 1.0

  /** The close-out regression rule, IDENTICAL to
    * scripts/bench_compare.py's exit gate: a gate regressed when
    * new/old > `ratio` AND new - old > `absSec` (two-sided — ratio
    * alone flags ms-noise on trivial gates, absolute alone flags host
    * drift on heavyweights). Returns (name, old, new) sorted by name;
    * gates absent from the baseline (or non-positive there) never
    * regress. Pinned against hand-worked cases in BenchCompareSpec. */
  private[graft] def regressions(baseline: Map[String, Double],
                                 results: Map[String, Double],
                                 ratio: Double = BaselineRatio,
                                 absSec: Double = AbsSecFloor)
      : Seq[(String, Double, Double)] =
    results.toSeq.sortBy(_._1).flatMap { case (name, b) =>
      baseline.get(name) match {
        case Some(a) if a > 0 && b / a > ratio && b - a > absSec =>
          Some((name, a, b))
        case _ => None
      }
    }

  /** Band-exit regression rule (r11 verdict item 2): the single-
    * baseline rule above compares against ONE old reading, so bimodal
    * gates (q_binaryfile_ingest 1.1–2.6 s) generated recurring noise
    * adjudications. Against a band of the last N committed artifacts
    * (scripts/bench_bands.py → bench_bands.json), a gate is flagged
    * only when it EXITS the observed envelope: new > bandMax by BOTH
    * the ratio margin and the absolute floor. The margin is tighter
    * than the single-baseline 1.5× because the band already absorbs
    * the host's measured run-to-run spread — exceeding its worst
    * committed reading by 25% and a full second is signal, not noise.
    * Pinned in BenchCompareSpec. */
  private[graft] def bandRegressions(bands: Map[String, (Double, Double)],
                                     results: Map[String, Double],
                                     ratio: Double = BandRatio,
                                     absSec: Double = AbsSecFloor)
      : Seq[(String, Double, Double)] =
    results.toSeq.sortBy(_._1).flatMap { case (name, b) =>
      bands.get(name) match {
        case Some((_, hi)) if hi > 0 && b / hi > ratio && b - hi > absSec =>
          Some((name, hi, b))
        case _ => None
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // environment contract: local[32], shuffle.partitions = cores
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
      // canChangeCachedPlanOutputPartitioning=true (added round 16 for
      // Checkpoints.pinPartitioned) REMOVED round 17: it changed AQE
      // behavior for EVERY cached frame in the engine and shipped
      // inside the harness file, and the driver's cold bench flagged
      // the gates it served as regressed. pinPartitioned now sizes its
      // partition count explicitly, which needs no session conf.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: scheduler + codegen + parquet reader init, excluded
    // from per-query timings (standard bench hygiene). EVERY fixture
    // table is touched, not just lineitem — documents/embeddings
    // footers + page cache were previously charged to whichever gate
    // read them first alphabetically (the same session-history signal
    // as the store warm pass below, r12).
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      // noop sink, not count(): count prunes every column and reads
      // only footers — the point is paging the column chunks in
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    // UNTIMED setup: one-time content-addressed store/index builds
    // (graph edge layouts, ANN/inverted indexes, maintained MVs).
    // With a metastore these are paid once per corpus refresh; the
    // in-memory catalog would otherwise re-charge each build to the
    // alphabetically-first consumer gate in every fresh session
    // (measured: the whole r5→r6 graph-family regression). Build cost
    // is still reported — as setup_sec, separated from query cost. A
    // failed build is only logged: the consumer gate's own guard
    // re-runs it (timed) and surfaces the error there.
    val setupT0 = System.nanoTime()
    // per-store attribution (r10 verdict item 2): the 47 -> 72 s driver
    // swing in setup_sec had no breakdown — record each prepare's name,
    // seconds, and warehouse-bytes delta the way gates carry gc/heap
    val setupSecs = scala.collection.mutable.LinkedHashMap[String, Double]()
    val setupBytes = scala.collection.mutable.LinkedHashMap[String, Long]()
    var setupDoubleBuilds: Seq[String] = Seq.empty
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val whFs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Bytes a single table left in the warehouse (its managed dir).
    // Attribution switched from whole-warehouse getContentSummary
    // deltas (2 full tree walks per prepare, both UNATTRIBUTED —
    // ~18 s of r12's 87 - 69 s setup gap) to per-table walks over the
    // tables each prepare's build registered in StoreLedger.
    def tableBytes(tbl: String): Long =
      try {
        val p = new org.apache.hadoop.fs.Path(warehouse,
          tbl.toLowerCase(java.util.Locale.ROOT))
        if (whFs.exists(p)) whFs.getContentSummary(p).getLength else 0L
      } catch { case _: Throwable => 0L }
    if (!sys.env.contains("SPARK_GRAFT_SKIP_SETUP")) {
      // The prepares are independent content-addressed store builds
      // (shared sub-stores are serialized by StoreLedger's per-key
      // locks), and each is a small Spark job that underuses 32 cores
      // — at a deployment, store refreshes are submitted concurrently
      // and the cluster scheduler interleaves them. Pool of 4 threads
      // (r12 verdict item 2): setup wall drops toward the critical
      // path; per-prepare secs remain wall-clock UNDER CONCURRENCY
      // (they overlap; their sum exceeds setup_sec by design).
      val prepares = graft.queries.Registry.prepares
      val poolN = math.min(4, math.max(1, prepares.size))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(poolN)
      val done = prepares.map { case (name, fn) =>
        name -> pool.submit(new java.util.concurrent.Callable[Double] {
          def call(): Double = {
            graft.ops.StoreLedger.currentOwner.set(name)
            val t = System.nanoTime()
            try {
              fn(spark, sfDir)
              val sec = (System.nanoTime() - t) / 1e9
              System.err.println(f"[setup] $name $sec%.2f s")
              sec
            } catch { case e: Throwable =>
              System.err.println(
                s"[setup] $name FAILED: ${e.getMessage}")
              (System.nanoTime() - t) / 1e9
            } finally graft.ops.StoreLedger.currentOwner.remove()
          }
        })
      }
      done.foreach { case (name, fut) => setupSecs(name) = fut.get() }
      pool.shutdown()
      // bytes per prepare = the managed dirs of the tables its builds
      // registered (deduped across markers of one prepare)
      val owned = scala.collection.mutable
        .LinkedHashMap[String, scala.collection.mutable.Set[String]]()
      graft.ops.StoreLedger.buildLog.forEach { (_, rec) =>
        if (rec.owner != null)
          owned.getOrElseUpdate(rec.owner,
            scala.collection.mutable.Set[String]()) ++= rec.tables
      }
      setupSecs.keys.foreach { name =>
        setupBytes(name) =
          owned.get(name).map(_.toSeq.map(tableBytes).sum).getOrElse(0L)
      }
      // "no store built twice per session" (r12 verdict item 2): any
      // ledger key whose build block ran more than once is a wasted
      // rebuild — surfaced in the artifact, asserted by the sweep spec
      setupDoubleBuilds = graft.ops.StoreLedger.doubleBuilds()
      if (setupDoubleBuilds.nonEmpty)
        System.err.println(
          s"[setup] DOUBLE BUILDS: ${setupDoubleBuilds.mkString(", ")}")
      // UNTIMED store warm pass: a store's first consumer gate otherwise
      // pays the cold read of its parquet files (footers + OS page
      // cache) — exactly the signal behind q_incr_curation_pipeline's
      // twice-flagged driver-context drift (r9 5.5x, r10 1.51x vs the
      // builder close-out, GC-exonerated): a slower driver setup pass
      // leaves the LSH store cold for its alphabetically-first consumer.
      // At a deployment the store refresh both builds AND leaves warm
      // caches; charging the cold read to one arbitrary gate measures
      // session history, not the operator. A/B switch below reproduces
      // the cold behavior on demand (mechanism recorded in BASELINE.md).
      if (!sys.env.contains("SPARK_GRAFT_NO_WARM")) {
        val t = System.nanoTime()
        spark.catalog.listTables().collect().foreach { tb =>
          try spark.table(tb.name)
            .write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
        val sec = (System.nanoTime() - t) / 1e9
        setupSecs("_warm_tables") = sec
        System.err.println(f"[setup] _warm_tables $sec%.2f s")
      }
    }
    val setupSec = (System.nanoTime() - setupT0) / 1e9
    // RDDs persisted by setup (shared store scaffolding) are the
    // session baseline; everything persisted AFTER this point is
    // gate-local and must be freed at gate end (see below)
    val baselineRdds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    // The inter-gate unpersist of localCheckpointed RDDs logs a
    // 'lineage has been truncated' WARN per RDD — 200+ of them flood
    // the ~2 KB driver-captured stdout/stderr tail and crowd out the
    // JSON line (r10 advice). The warning is expected here by
    // construction (the blocks are gate-local and the gate is done);
    // silence the RDD loggers for the bench session.
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val failMsgs = scala.collection.mutable.LinkedHashMap[String, String]()
    // per-gate attribution columns (r9 verdict: the driver-session
    // spikes on store-heavy gates were unattributable without them)
    val gcMs = scala.collection.mutable.LinkedHashMap[String, Long]()
    val heapMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    var peakHeapMb = 0.0
    // local-iteration filter (comma-separated names); the driver never
    // sets it, so the per-round contract is unchanged
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // per-gate contention witness (see loadAvg1)
    val load1 = scala.collection.mutable.LinkedHashMap[String, Double]()
    val loadStart = loadAvg1()
    // RESUMABLE PROGRESS (r14: two sf10 full-registry sweeps were
    // preempted by round end with ZERO artifact to show for 4+ h of
    // green gates). When SPARK_GRAFT_BENCH_PROGRESS names a file, each
    // completed gate appends one JSON line {gate, sec, gc_ms, heap_mb,
    // load1} immediately; on startup, gates already present are SKIPPED
    // and their recorded numbers merged into the final artifact (the
    // content-addressed stores persist in the warehouse, so a resumed
    // session rebuilds nothing). A preempted sweep thus always leaves a
    // line-per-gate record that the next session finishes or a script
    // assembles. Failed gates are never recorded — a resume retries
    // them. The artifact carries n_resumed for honesty.
    val progressPath = sys.env.get("SPARK_GRAFT_BENCH_PROGRESS")
    val resumed = scala.collection.mutable.LinkedHashMap[String,
      (Double, Long, Double, Double)]() // sec, gcMs, heapMb, load1
    progressPath.foreach { p =>
      val f = new java.io.File(p)
      if (f.isFile) {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        scala.io.Source.fromFile(f, "UTF-8").getLines()
          .filter(_.trim.nonEmpty).foreach { line =>
            try {
              val n = om.readTree(line)
              resumed(n.path("gate").asText()) = (
                n.path("sec").asDouble(),
                n.path("gc_ms").asLong(),
                n.path("heap_mb").asDouble(),
                if (n.has("load1")) n.path("load1").asDouble() else -1.0)
            } catch { case _: Throwable => () }
          }
        if (resumed.nonEmpty) System.err.println(
          s"[bench] resuming past ${resumed.size} recorded gate(s) from $p")
      }
    }
    val gateTimeoutSec =
      sys.env.get("SPARK_GRAFT_GATE_TIMEOUT_SEC").flatMap(_.toIntOption)
    def appendProgress(name: String, sec: Double, gc: Long,
                       heap: Double, ld: Double): Unit =
      progressPath.foreach { p =>
        try {
          val w = new java.io.FileWriter(p, true)
          try w.write(
            s"""{"gate":"$name","sec":$sec,"gc_ms":$gc,"heap_mb":$heap,"load1":$ld}""" + "\n")
          finally w.close()
        } catch { case _: Throwable => () }
      }
    System.gc()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .flatMap {
      case (name, _) if resumed.contains(name) =>
        val (sec, gc, heap, ld) = resumed(name)
        gcMs(name) = gc; heapMb(name) = heap
        if (ld >= 0) load1(name) = ld
        Some(name -> sec)
      case (name, fn) =>
        val gc0 = gcMillis()
        val t0 = System.nanoTime()
        // noop sink materializes EVERY column and keeps sorts/projections
        // in the plan — .count() let Catalyst prune exactly the per-row
        // expression work most of these queries exist to measure
        val r = try {
          withGateWatchdog(spark, name, gateTimeoutSec) {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
          val sec = (System.nanoTime() - t0) / 1e9
          // one stderr line per gate: long sweeps (hours at sf10) are
          // otherwise unobservable until the final JSON
          System.err.println(f"[bench] $name $sec%.2f s")
          Some(name -> sec)
        } catch { case e: Throwable =>
          // a throwing query must not masquerade as a speedup: it is
          // EXCLUDED from the timing map entirely (its time-to-fail
          // would still read as "faster" in bench_compare.py) and
          // surfaced in failed[] / n_failed instead
          failed += name
          failMsgs(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
        // STW time accrued while THIS gate ran — before cleanup, so
        // the cleanup gc below is never charged to the gate
        gcMs(name) = gcMillis() - gc0
        // free gate-local persisted blocks: a localCheckpoint() inside
        // a gate pins its blocks in the block manager for the rest of
        // the session unless unpersisted — across 246 gates at -Xmx8g
        // that accumulation was the r9 driver-run spike suspect. Only
        // NON-baseline ids are dropped: setup-built store scaffolding
        // stays resident, every store itself is a table on disk.
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!baselineRdds.contains(id))
            try rdd.unpersist(blocking = true)
            catch { case _: Throwable => () }
        }
        // post-gate post-gc resident heap: monotonic growth across
        // gates = something survives cleanup (the leak signal); flat =
        // the spike was in-gate pressure, not accumulation. This gc
        // also serves as the pre-gate gc for the NEXT gate, so the
        // per-gate gc count is unchanged from r9.
        System.gc()
        val h = usedHeapMb()
        heapMb(name) = math.round(h * 10) / 10.0
        if (h > peakHeapMb) peakHeapMb = h
        val ld = loadAvg1()
        if (ld >= 0) load1(name) = math.round(ld * 100) / 100.0
        r.foreach { case (_, sec) =>
          appendProgress(name, math.round(sec * 1000) / 1000.0,
            gcMs(name), heapMb(name), load1.getOrElse(name, -1.0))
        }
        r
    }.toMap
    // The driver captures only the TAIL of this process's output
    // (~2 KB): a queries map with all 80+ entries at full double
    // precision overflows that window and the line arrives truncated
    // mid-JSON (BENCH_r02 recorded parsed:null). Keep the line well
    // under the window — 3-decimal seconds, only the 25 slowest
    // queries inline — and dump the complete per-query map to
    // bench_full.json beside the repo for baseline bookkeeping.
    def r3(v: Double): Double = math.round(v * 1000).toDouble / 1000
    val total = if (results.nonEmpty) r3(results.values.sum) else 0.0
    val fullQs = results.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }
    val failedJson = failed.sorted.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    // error strings travel in the JSON itself — a bare failed[] list
    // forced a round of repro detective work once
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errsJson = failMsgs.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v.take(300)) }
      .mkString("{", ",", "}")
    val gcJson = gcMs.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val heapJson = heapMb.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // self-describing regression block (r9 verdict item 3): diff this
    // run against the committed close-out artifact with the same
    // two-sided rule as scripts/bench_compare.py, so a driver run that
    // regresses carries its own comparison instead of waiting for a
    // builder session to notice
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE",
      "bench_closeout.json")
    val bandsPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BANDS",
      "bench_bands.json")
    def readJson(path: String)
        : Option[com.fasterxml.jackson.databind.JsonNode] =
      try {
        val f = new java.io.File(path)
        if (!f.isFile) None
        else {
          val raw0 = new String(
            java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          Some(new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(raw0.substring(raw0.indexOf('{'))))
        }
      } catch { case _: Throwable => None }
    val baseNode = readJson(baselinePath)
    val baseQs: Map[String, Double] = baseNode.map { node =>
      import scala.jdk.CollectionConverters._
      node.path("queries").properties().asScala
        .filter(_.getValue.isNumber)
        .map(e => e.getKey -> e.getValue.asDouble()).toMap
    }.getOrElse(Map.empty)
    // per-gate honest bands (r11 verdict item 2): min/max over the
    // last N committed artifacts, built by scripts/bench_bands.py —
    // banded gates flag only on band-EXIT; gates new since the bands
    // file fall back to the single-baseline rule
    val bands: Map[String, (Double, Double)] = readJson(bandsPath)
      .map { node =>
        import scala.jdk.CollectionConverters._
        node.path("bands").properties().asScala.map { e =>
          e.getKey -> (e.getValue.path("min").asDouble(),
            e.getValue.path("max").asDouble())
        }.toMap
      }.getOrElse(Map.empty)
    val flagged: Seq[(String, Double, Double, String)] =
      (bandRegressions(bands, results)
         .map { case (n, hi, b) => (n, hi, b, "band") } ++
       regressions(baseQs,
           results.filter { case (k, _) => !bands.contains(k) })
         .map { case (n, a, b) => (n, a, b, "baseline") })
        .sortBy(_._1)
    // SECOND-RUN attribution pass (r11 verdict item 1 — the third
    // consecutive driver run flagged q_incr_curation_pipeline despite
    // the warm pass holding 4/4 on the builder host): every flagged
    // gate re-runs ONCE, timed, at the end of the session. The primary
    // queries map keeps the honest FIRST-run reading; the pair is what
    // separates a plan regression (second run still band-exits →
    // "regressed") from driver-context cold-read/JIT effects (second
    // run in-band → "context"). A recurrence now self-attributes in
    // the driver's own artifact instead of costing a builder round.
    // CAP on re-runs (r14: 36 flags under host contention cost ~4.5 min
    // of re-runs inside the driver window — the re-runs themselves were
    // half the wall regression). Re-run the WORST offenders by ratio;
    // flags beyond the cap stay flagged with verdict "unadjudicated"
    // (never laundered into context, never claimed regressed without a
    // second reading). A quiet session rarely flags more than a handful,
    // so the cap only binds exactly when re-runs are least informative.
    val secondRunCap = sys.env.get("SPARK_GRAFT_SECOND_RUN_CAP")
      .flatMap(_.toIntOption).getOrElse(12)
    val rerunSet: Set[String] = flagged
      .sortBy { case (_, ref, b, _) => -(b / math.max(ref, 1e-9)) }
      .take(secondRunCap).map(_._1).toSet
    val secondRun: Map[String, Double] =
      if (sys.env.contains("SPARK_GRAFT_NO_SECOND_RUN")) Map.empty
      else flagged.filter(f => rerunSet.contains(f._1))
        .flatMap { case (name, _, _, _) =>
        SparkEntry.queries.get(name).flatMap { fn =>
          System.gc()
          val t0 = System.nanoTime()
          val r = try {
            withGateWatchdog(spark, name, gateTimeoutSec) {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            }
            Some(name -> (System.nanoTime() - t0) / 1e9)
          } catch { case _: Throwable => None }
          spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
            if (!baselineRdds.contains(id))
              try rdd.unpersist(blocking = true)
              catch { case _: Throwable => () }
          }
          r
        }
      }.toMap
    def inBand(name: String, v: Double): Boolean = bands.get(name) match {
      case Some((_, hi)) if hi > 0 =>
        !(v / hi > BandRatio && v - hi > AbsSecFloor)
      case _ => baseQs.get(name) match {
        case Some(a) if a > 0 =>
          !(v / a > BaselineRatio && v - a > AbsSecFloor)
        case _ => true
      }
    }
    val verdicts = flagged.map { case (name, ref, b, rule) =>
      val s2 = secondRun.get(name)
      // no second reading: a gate the cap excluded is "unadjudicated"
      // (flag stands, no verdict without evidence); a gate whose
      // re-run was attempted but failed/skipped keeps the honest
      // "regressed" rather than laundering into "context"
      val verdict =
        if (s2.exists(inBand(name, _))) "context"
        else if (!rerunSet.contains(name) &&
                 !sys.env.contains("SPARK_GRAFT_NO_SECOND_RUN"))
          "unadjudicated"
        else "regressed"
      (name, ref, b, rule, s2, verdict)
    }
    val nConfirmed = verdicts.count(_._6 == "regressed")
    val nContext = verdicts.count(_._6 == "context")
    val nUnadjudicated = verdicts.count(_._6 == "unadjudicated")
    // -1 on the stdout line = "no comparison happened" (baseline AND
    // bands both absent/unreadable) — distinguishable from a genuinely
    // clean compare's 0 inside the ~2 KB driver tail (r10 advice)
    val nRegressed =
      if (baseQs.isEmpty && bands.isEmpty) -1 else nConfirmed
    val compareJson = {
      val entries = verdicts.map { case (name, ref, b, rule, s2, v) =>
        s"""${jstr(name)}:{"rule":${jstr(rule)},"ref":${r3(ref)},"new":${r3(b)}${s2.map(s => s""","second":${r3(s)}""").getOrElse("")},"verdict":${jstr(v)}}"""
      }
      val baseTotal = baseNode
        .map(n => s""","baseline_total":${r3(n.path("value").asDouble())}""")
        .getOrElse("")
      s"""{"baseline":${jstr(baselinePath)},"bands":${jstr(bandsPath)},"n_bands":${bands.size}$baseTotal,"n_regressed":$nConfirmed,"n_context":$nContext,"n_unadjudicated":$nUnadjudicated,"regressed":${entries.mkString("{", ",", "}")}}"""
    }
    val totalGcMs = gcMs.values.sum
    val endHeap = heapMb.toSeq.lastOption.map(_._2).getOrElse(0.0)
    // per-prepare breakdown (insertion order = submit order; prepares
    // run on a 4-thread pool so secs OVERLAP — their sum exceeds
    // setup_sec by design; bytes is the size of the managed tables the
    // prepare's builds registered in StoreLedger) — file artifact
    // only, the stdout tail window can't fit it
    val setupJson = setupSecs.toSeq.map { case (k, v) =>
      jstr(k) + ":{\"sec\":" + r3(v) +
        setupBytes.get(k).map(b => s""","bytes":$b""").getOrElse("") + "}"
    }.mkString("{", ",", "}")
    val doubleBuildsJson =
      setupDoubleBuilds.map(jstr).mkString("[", ",", "]")
    val loadJson = load1.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val loadEnd = loadAvg1()
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"n_resumed":${resumed.size},"failed":$failedJson,"errors":$errsJson,"setup_sec":${r3(setupSec)},"setup_mode":"pool4","setup_double_builds":$doubleBuildsJson,"setup":$setupJson,"gc_ms_total":$totalGcMs,"peak_heap_mb":${r3(peakHeapMb)},"end_heap_mb":$endHeap,"load_start":${math.round(loadStart * 100) / 100.0},"load_end":${math.round(loadEnd * 100) / 100.0},"compare":$compareJson,"queries":${fullQs.mkString("{", ",", "}")},"gc_ms":$gcJson,"heap_mb":$heapJson,"load1":$loadJson,"sf":"$sfDir"}"""
    // never clobber the driver's artifact: honor an explicit override,
    // else write a (millis, pid)-keyed file (a judge/builder repro once
    // overwrote bench_full.json and lost ~136 gates' timings; pid
    // guards the parallel-runs-same-instant case)
    val outName = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"bench_full_${System.currentTimeMillis()}_" +
        s"${ProcessHandle.current().pid()}.json")
    try {
      val w = new java.io.PrintWriter(outName)
      try w.println(full) finally w.close()
      // keep a predictable handle on the latest run for external
      // collectors and the close-out regression diff
      // (scripts/bench_compare.py) without ever clobbering a prior
      // run's artifact: bench_latest.json is a symlink refreshed to
      // whatever file this run just wrote — custom SPARK_GRAFT_BENCH_OUT
      // runs included (a symlink refresh clobbers no artifact, and the
      // verify skill promises the link always tracks the newest run)
      val link = java.nio.file.Paths.get("bench_latest.json")
      val target = java.nio.file.Paths.get(outName).toAbsolutePath
      // SPARK_GRAFT_BENCH_OUT=bench_latest.json would otherwise delete
      // the just-written artifact and leave a self-referential symlink
      if (link.toAbsolutePath.normalize != target.normalize) {
        java.nio.file.Files.deleteIfExists(link)
        java.nio.file.Files.createSymbolicLink(link, target)
      }
    } catch { case _: Throwable => () }
    val topQs = fullQs.take(25).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"setup_sec":${r3(setupSec)},"gc_ms_total":$totalGcMs,"peak_heap_mb":${r3(peakHeapMb)},"load_start":${math.round(loadStart * 100) / 100.0},"load_end":${math.round(loadEnd * 100) / 100.0},"n_regressed":$nRegressed,"n_context":$nContext,"n_unadjudicated":$nUnadjudicated,"queries":$topQs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
