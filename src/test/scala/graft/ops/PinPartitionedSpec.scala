package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-16 iteration-static partitioning optimization:
  * [[Checkpoints.pinPartitioned]] must (a) keep the hash partitioning
  * visible to downstream aggregates — no shuffle Exchange above a
  * groupBy on the pinned key (the property localCheckpoint loses,
  * measured in tools.PlanPeek) — and (b) leave results identical to
  * the unpinned shape, including through the consumers that switched
  * to it (KCore.peel, PageRank.pageRank). */
class PinPartitionedSpec extends SparkSpec {
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case e: ShuffleExchangeLike => e }.size
  }

  test("groupBy on the pinned key plans no shuffle above the cache") {
    val base = spark.range(10000)
      .select((col("id") % 97).as("k"), col("id").as("v"))
    val pinned = Checkpoints.pinPartitioned(base, "k")
    try {
      val agg = pinned.select(col("k").as("id"), col("v"))
        .groupBy("id").agg(sum("v").as("s"))
      assert(shuffleCount(agg) === 0,
        "pinned frame must feed the aggregate exchange-free")
      // the checkpoint shape it replaced DOES pay the exchange —
      // guards against the test trivially passing via some other rule
      val ck = base.repartition(col("k")).localCheckpoint()
        .select(col("k").as("id"), col("v"))
        .groupBy("id").agg(sum("v").as("s"))
      assert(shuffleCount(ck) === 1,
        "localCheckpoint loses partitioning (if this starts passing " +
          "at 0, Spark learned to keep it and pinPartitioned can " +
          "go back to checkpointing)")
    } finally pinned.unpersist()
  }

  test("KCore.peel and PageRank.pageRank identical pinned vs unpinned") {
    import spark.implicits._
    val edges = (0L until 400L)
      .map(i => (i % 37, (i * 7 + 3) % 41))
      .toDF("src", "dst")
    def runBoth[A](f: => A): (A, A) = {
      System.clearProperty("graft.pin.disable")
      val a = f
      System.setProperty("graft.pin.disable", "1")
      val b = try f finally System.clearProperty("graft.pin.disable")
      (a, b)
    }
    val (k1, k2) = runBoth(
      KCore.peel(edges, k = 3, rounds = 4).orderBy("id")
        .collect().toSeq)
    assert(k1 === k2)
    val (p1, p2) = runBoth(
      PageRank.pageRank(
          edges.select(col("src").as("id_a"), col("dst").as("id_b"))
            .toDF("src", "dst"), iters = 3)
        .orderBy("id").collect().toSeq)
    assert(p1 === p2)
  }
}
