package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-JVM A/B measurement harness (dev tool, round-16 optimization):
  * pays the untimed store-prepare pass ONCE, then times each named gate
  * `reps` times through the bench's own noop-sink semantics and prints
  * per-rep seconds plus the median. This is the verify skill's A/B
  * protocol ("3x per variant, compare medians") without re-paying a JVM
  * + setup per rep, and without the full-bench context noise.
  *
  *   runMain graft.tools.GateAB <sfDir> <g1,g2,...> [reps]
  *
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_AB_EXPLAIN=<dir>
  * dumps each gate's explain("formatted") to <dir>/<gate>.txt before
  * timing (the plans/r16 evidence files). */
object GateAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gates = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q_dedup_flagship"))
    val reps = args.lift(2).flatMap(_.toIntOption).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
      // let AQE size CACHED-plan partitions from runtime data while
      // keeping their hash partitioning: the iteration-static frames
      // pinned by Checkpoints.pinPartitioned stay exchange-free AND
      // coalesce to data-proportional partition counts instead of a
      // fixed shuffle.partitions fan-out (scale-adaptive, guide S2.2)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same untimed warm-up + store-prepare pass as Bench.main
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    val prepares = graft.queries.Registry.prepares
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    prepares.map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          graft.ops.StoreLedger.currentOwner.set(name)
          try fn(spark, sfDir)
          catch { case e: Throwable =>
            System.err.println(s"[ab-setup] $name FAILED: ${e.getMessage}") }
          finally graft.ops.StoreLedger.currentOwner.remove()
        }
      })
    }.foreach(_.get())
    pool.shutdown()
    spark.catalog.listTables().collect().foreach { tb =>
      try spark.table(tb.name)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val explainDir = sys.env.get("SPARK_GRAFT_AB_EXPLAIN")
    val baselineRdds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    // wall-time attribution listener: jobs + tasks + summed task time
    // vs shuffle bytes tells driver overhead apart from executor work
    val nJobs = new java.util.concurrent.atomic.AtomicLong
    val nTasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          nJobs.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          nTasks.incrementAndGet()
          val m = t.taskMetrics
          if (m != null) {
            taskMs.addAndGet(m.executorRunTime)
            gcMs.addAndGet(m.jvmGCTime)
            shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }
    gates.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[ab] $name: NO SUCH GATE")
        case Some(fn) =>
          explainDir.foreach { dir =>
            try {
              val df = fn(spark, sfDir)
              val txt = df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              val p = java.nio.file.Paths.get(dir, s"$name.txt")
              java.nio.file.Files.createDirectories(p.getParent)
              java.nio.file.Files.write(p,
                txt.getBytes("UTF-8"))
            } catch { case e: Throwable =>
              System.err.println(s"[ab] explain $name failed: $e") }
          }
          def timedRep(attr: Boolean): Double = {
            System.gc()
            Seq(nJobs, nTasks, taskMs, gcMs, shufR, shufW).foreach(_.set(0L))
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val s = (System.nanoTime() - t0) / 1e9
            spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
              if (!baselineRdds.contains(id))
                try rdd.unpersist(blocking = true)
                catch { case _: Throwable => () }
            }
            if (attr)  // warm rep: attribute where the time went
              println(f"[ab-attr] $name%-32s jobs=${nJobs.get}%3d " +
                f"tasks=${nTasks.get}%5d taskSec=${taskMs.get / 1e3}%8.2f " +
                f"gcSec=${gcMs.get / 1e3}%6.2f " +
                f"shufR=${shufR.get / 1048576.0}%8.1f MB " +
                f"shufW=${shufW.get / 1048576.0}%8.1f MB")
            s
          }
          def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
          // SPARK_GRAFT_AB_PROP=<sysprop>: interleave variant A (prop
          // unset) and variant B (prop=1) reps in ONE JVM — the only
          // timing comparison this host's cross-session drift allows
          sys.env.get("SPARK_GRAFT_AB_PROP") match {
            case Some(prop) =>
              val (as, bs) = (1 to reps).map { rep =>
                System.clearProperty(prop)
                val a = timedRep(attr = false)
                System.setProperty(prop, "1")
                val b = timedRep(attr = false)
                System.clearProperty(prop)
                (a, b)
              }.unzip
              println(f"[ab-cmp] $name%-32s A(base) ${med(as)}%7.3f s " +
                f"B($prop=1) ${med(bs)}%7.3f s   A " +
                as.map(s => f"$s%.3f").mkString(" ") + "   B " +
                bs.map(s => f"$s%.3f").mkString(" "))
            case None =>
              val secs = (1 to reps).map(rep => timedRep(attr = rep == reps))
              println(f"[ab] $name%-32s median ${med(secs)}%7.3f s   " +
                secs.map(s => f"$s%.3f").mkString(" "))
          }
      }
    }
    spark.stop()
  }
}
