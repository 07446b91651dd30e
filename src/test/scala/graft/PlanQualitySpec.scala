package graft

import graft.queries.Registry

/** Regression-pins the plan properties the engine is designed around:
  * filter pushdown, column pruning, broadcast joins, partial
  * aggregation. Uses sf0.001 so plans build fast. */
class PlanQualitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    Registry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q_agg_pricing: pruned scan + two-phase hash aggregation") {
    val p = plan("q_agg_pricing")
    // only the 5 needed columns reach the scan
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_orderkey"), "scan must prune unused columns")
    assert(p.split("HashAggregate").length >= 3,
      "expected partial + final HashAggregate")
  }

  test("q_dedup_agg: not-null filters pushed to the parquet scan") {
    val p = plan("q_dedup_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey)") ||
      p.contains("IsNotNull(l_orderkey)"), s"pushdown missing:\n$p")
  }

  test("q_join_chain: dims joined via broadcast, no shuffle join") {
    val p = plan("q_join_chain")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_agg_salted: two aggregation stages (salt then combine)") {
    val p = plan("q_agg_salted")
    assert(p.split("HashAggregate").length >= 3)
  }
}
