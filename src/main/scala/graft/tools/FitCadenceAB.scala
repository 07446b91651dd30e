package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialization-cadence A/B for the fixed-iteration fits (r11
  * verdict item 4): q_pref_bradley_terry / q_pref_rank_centrality /
  * q_graph_kcore are dominated at sf0.1 by per-iteration planning and
  * localCheckpoint overhead, not row work. `checkpointEvery = k`
  * fuses k update steps into one lazy plan before cutting lineage —
  * bit-identical results by construction (exact integer recurrences),
  * so this is purely a plan experiment. The harness times each fit at
  * cadences 1/2/5 (median of `reps`), verifies the outputs are
  * identical across cadences once, and prints one line per cell —
  * the BASELINE.md evidence for whichever cadence the gates keep.
  *
  * Run: `sbt "runMain graft.tools.FitCadenceAB [sfDir] [reps]"`. */
object FitCadenceAB {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    // the q_pref_* duel recipe (AnalyticsQueries): supplier quantity
    // contests within an order, strict key order, ties skipped
    def duels: DataFrame = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey") &&
          col("a.l_quantity") =!= col("b.l_quantity"))
      .select(col("a.l_suppkey").as("i"), col("b.l_suppkey").as("j"),
        (col("a.l_quantity") > col("b.l_quantity")).as("awin"))
    // the q_graph_kcore edge recipe: distinct co-purchase part pairs
    def edges: DataFrame = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
      .as("a").join(spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_partkey").as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()

    def runs: Seq[(String, Int => DataFrame)] = Seq(
      "bradley_terry(iters=5)" ->
        (c => graft.ops.BradleyTerry.fit(duels, iters = 5,
          checkpointEvery = c)),
      "rank_centrality(iters=5)" ->
        (c => graft.ops.RankCentrality.fit(duels, iters = 5,
          checkpointEvery = c)),
      "kcore(k=80,rounds=6)" ->
        (c => graft.ops.KCore.peel(edges, k = 80, rounds = 6,
          checkpointEvery = c)))

    def freeGateBlocks(baseline: Set[Int]): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline.contains(id))
          try rdd.unpersist(blocking = true)
          catch { case _: Throwable => () }
      }

    val base = spark.sparkContext.getPersistentRDDs.keySet.toSet
    runs.foreach { case (name, mk) =>
      // bit-identity check once per fit (sorted collect, tiny vectors)
      val ref = mk(1).orderBy("id").collect().map(_.toSeq).toSeq
      freeGateBlocks(base)
      Seq(2, 5).foreach { c =>
        val got = mk(c).orderBy("id").collect().map(_.toSeq).toSeq
        freeGateBlocks(base)
        require(got == ref, s"$name cadence $c diverged from cadence 1")
      }
      Seq(1, 2, 5).foreach { c =>
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          mk(c).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          freeGateBlocks(base)
          dt
        }
        val med = ts.sorted.apply(reps / 2)
        println(f"[fit-ab] $name%-26s cadence=$c  median $med%6.2f s" +
          s"  (runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
      }
    }
    spark.stop()
  }
}
