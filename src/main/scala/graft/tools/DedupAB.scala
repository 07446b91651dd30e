package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** A/B micro-benchmark for the three keep-most-complete formulations
  * (window row_number / typed-imperative min_by_obj / declarative
  * min_by), at two duplication regimes:
  *
  *  - `low`  — the flagship two-source union (~2.6 rows per key):
  *    map-side combine buys almost nothing, per-row constants dominate.
  *  - `high` — lineitem keyed by `l_orderkey % 12k` (~50 rows per
  *    key): map-side combine collapses the shuffle 50×, the regime the
  *    aggregate formulation exists for.
  *
  * Run: `sbt "runMain graft.tools.DedupAB [sfDir] [iters]"`.
  * Variants are interleaved per round and medians reported, so host
  * drift lands on every variant equally. This is the measurement
  * behind the default chosen in [[graft.ops.Dedup]] — re-run it before
  * changing that default. */
object DedupAB {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

    def low = graft.queries.RefQueries.twoSourceUnion(spark, sfDir)
    def high = graft.Tables.lineitem(spark, sfDir)
      .withColumn("__k", col("l_orderkey") % 12000)

    val lowKeys = Seq("l_orderkey", "l_linenumber")
    val lowTb = Seq("src") ++ liCols
    val highKeys = Seq("__k")
    val highTb = liCols

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "low/window" -> (() => Dedup.keepMostComplete(low, lowKeys, lowTb)),
      "low/obj" -> (() => Dedup.keepMostCompleteAgg(low, lowKeys, lowTb)),
      "low/decl" -> (() => Dedup.keepMostCompleteAggDecl(low, lowKeys, lowTb)),
      "high/window" -> (() => Dedup.keepMostComplete(high, highKeys, highTb)),
      "high/obj" -> (() => Dedup.keepMostCompleteAgg(high, highKeys, highTb)),
      "high/decl" -> (() => Dedup.keepMostCompleteAggDecl(high, highKeys, highTb))
    )

    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (round <- 1 to iters; (name, mk) <- variants) {
      System.gc()
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = times(name) :+ dt
      println(f"round $round  $name%-12s $dt%6.2f s")
    }
    println("\n== medians ==")
    variants.foreach { case (name, _) =>
      val sorted = times(name).sorted
      val med = sorted(sorted.length / 2)
      println(f"$name%-12s ${med}%6.2f s   (runs: ${
        times(name).map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
