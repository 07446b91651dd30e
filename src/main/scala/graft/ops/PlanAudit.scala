package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale lint for a composed query — the pre-flight a 100 TB run
  * deserves, promoted from this repo's own registry-wide test sweep
  * (PlanSweepSpec) into a public API. Given any DataFrame, reports
  * the plan shapes that silently become cluster-killers when the
  * input grows 100×:
  *
  *  - `cartesian`: a CartesianProduct — O(n·m) pairs through a full
  *    shuffle of both sides; at corpus scale this never finishes.
  *  - `bnlj`: a BroadcastNestedLoopJoin — a per-row scan of the
  *    broadcast side; admissible ONLY when the broadcast side is
  *    bounded by construction (codebooks, query batches), which the
  *    caller asserts by allowlisting the kind.
  *  - `global_window`: a window function with an empty PARTITION BY —
  *    plans a single-partition exchange that funnels the entire input
  *    through one task; admissible only over aggregate-bounded or
  *    limit(k) inputs.
  *
  * The audit reads plan STRUCTURE (logical for windows — the physical
  * WindowExec hides the spec; physical for joins — that is where the
  * strategy choice lives) and never executes the frame. Sizes are
  * deliberately not consulted: at development scale everything is
  * small, which is exactly how these shapes ship — the lint flags the
  * SHAPE, and the caller either re-plans or records the bound via
  * `allow`. [[assertClean]] is the CI form: throw with the full
  * report unless every finding's kind is allowlisted. */
object PlanAudit {

  /** One hazard: `kind` ∈ {cartesian, bnlj, global_window}, `node`
    * is the offending plan node's one-line rendering. */
  final case class Finding(kind: String, node: String)

  def audit(df: DataFrame): Seq[Finding] = {
    // the physical plan is read through its rendering, not a tree
    // collect: under AQE the root is AdaptiveSparkPlanExec, whose
    // current plan is not reachable via collect() — toString renders
    // the whole (initial) plan, which carries the strategy choice
    val physical = df.queryExecution.executedPlan.toString
      .linesIterator.flatMap { line =>
        val t = line.dropWhile(c => !c.isLetter)
        if (t.startsWith("CartesianProduct"))
          Some(Finding("cartesian", oneLine(t)))
        else if (t.startsWith("BroadcastNestedLoopJoin"))
          Some(Finding("bnlj", oneLine(t)))
        else None
      }.toSeq
    // collectWithSubqueries, not collect: a global window INSIDE a
    // scalar/IN/EXISTS subquery funnels its whole input through one
    // task just the same, and plain collect never descends into
    // SubqueryExpression plans (the join checks above already see
    // subqueries because toString renders them as innerChildren)
    val logical = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty =>
        Finding("global_window", oneLine(w.simpleString(120)))
    }
    physical ++ logical
  }

  /** Throw `IllegalStateException` with the full report when any
    * finding's kind is not in `allow` — the caller's allowlist is the
    * written record that a flagged shape is bounded by construction. */
  def assertClean(df: DataFrame, allow: Set[String] = Set.empty): Unit = {
    val bad = audit(df).filterNot(f => allow.contains(f.kind))
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "scale-hostile plan shapes (re-plan, or allowlist the kind " +
          "with its written bound):\n" +
          bad.map(f => s"  [${f.kind}] ${f.node}").mkString("\n"))
  }

  private def oneLine(s: String): String =
    s.replace('\n', ' ').take(200)
}
