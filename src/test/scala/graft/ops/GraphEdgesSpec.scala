package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the shared-edge-layout contracts: the stored table equals the
  * inline pair expansion row-for-row, and reading it for key-clustered
  * work (groupBy/join on src) plans with NO exchange over the edge
  * side — the property the write-once layout exists to buy. */
class GraphEdgesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def li = spark.read.parquet(s"$sf/lineitem.parquet")

  private def inline = GraphEdges.copurchaseSupport(li, "l_orderkey",
    "l_partkey")

  // lazy fixture: both tests can run in isolation
  private lazy val storedTable: String = {
    GraphEdges.shared(spark, "t_grf_edges_spec", inline)
    "t_grf_edges_spec"
  }

  test("stored layout equals the inline expansion; src-keyed reads " +
      "are exchange-free over the edge side") {
    val stored = spark.table(storedTable)
    assert(stored.orderBy("src", "dst").collect().toSeq ==
      inline.orderBy("src", "dst").collect().toSeq)

    // groupBy on the bucket key must read the hash distribution off
    // storage: no Exchange anywhere in the plan
    val agg = stored.groupBy("src").agg(sum("support").as("s"))
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucketed src aggregation must not shuffle:\n$p")
    assert(p.contains("Bucketed: true"),
      s"scan must report the bucketed layout:\n$p")
  }

  test("consumers derive their graphs by filter/projection only " +
      "(label-prop threshold is a stored-column filter)") {
    val stored = spark.table(storedTable)
    val thresholded = stored.filter(col("support") >= 2)
      .select("src", "dst")
    val p = thresholded.queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate"),
      s"support threshold must not recount pairs:\n$p")
    // filter reaches the stored scan
    assert(p.contains("PushedFilters") && p.contains("support"),
      s"support filter should push to the parquet scan:\n$p")
  }
}
