package graft.plans

import graft.functions.MinByObj
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the keep-first-row window idiom
  *
  *   Filter(rn = 1, Window(row_number() OVER (PARTITION BY p ORDER BY
  *   o ASC NULLS FIRST) AS rn, child))
  *
  * into the partial-aggregable form
  *
  *   Project(struct fields restored, Aggregate(p,
  *     min_by_obj(struct(child.*), struct(o)), child))
  *
  * Both compute "one surviving row per p-group, minimal by o"; the
  * window form shuffles and SORTS every row of every group, the
  * aggregate form map-side combines — each task ships one candidate
  * row per (group, partition), and nothing is sorted. The rewrite
  * emits [[graft.functions.MinByObj]] rather than the built-in MinBy:
  * the declarative MinBy's struct buffer forces SortAggregateExec
  * (sorts on both sides of the shuffle — the thing this rule exists
  * to remove), while the typed-imperative form runs in
  * ObjectHashAggregateExec, sort-free. Results are
  * identical whenever the o-ordering is total per group (ties are
  * implementation-chosen in BOTH forms — same contract as the
  * reference's dedup, jobs/spark/merge_dedup.py:25-26).
  *
  * Guards: single row_number window expression; every sort key
  * ascending nulls-first (struct ordering compares fields asc,
  * nulls first — direction must agree); filter conjuncts only
  * `rn = 1` / `IsNotNull(rn)`. The rewrite preserves output attribute
  * ids (struct fields re-aliased to the original exprIds; rn becomes
  * literal 1), so parent plans are untouched.
  *
  * Registered via `spark.experimental.extraOptimizations` (the
  * runtime form of SparkSessionExtensions#injectOptimizerRule).
  * Injection is deliberately OPT-IN per session: the aggregate form
  * wins when groups hold many rows (measured crossover ~10 rows/key,
  * see [[graft.ops.Dedup]]); below that Spark's own
  * InferWindowGroupLimit already gives the window form map-side
  * group-limit and the rewrite would not pay for itself. */
object DedupWindowToAggregate extends Rule[LogicalPlan] {

  private def one(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v == 1
    case _ => false
  }

  /** All conjuncts reference only rn (= 1 or not-null), with at least
    * one equality. */
  private def isKeepFirst(cond: Expression, rn: Attribute): Boolean = {
    val conjuncts = splitConjunctivePredicates(cond)
    val eq = conjuncts.collect {
      case EqualTo(a: AttributeReference, l) if a.exprId == rn.exprId &&
        one(l) => true
      case EqualTo(l, a: AttributeReference) if a.exprId == rn.exprId &&
        one(l) => true
    }
    val rest = conjuncts.forall {
      case EqualTo(a: AttributeReference, l) =>
        a.exprId == rn.exprId && one(l)
      case EqualTo(l, a: AttributeReference) =>
        a.exprId == rn.exprId && one(l)
      case IsNotNull(a: AttributeReference) => a.exprId == rn.exprId
      case _ => false
    }
    eq.nonEmpty && rest
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          partSpec, ordSpec, child, _))
        if ordSpec.nonEmpty &&
          ordSpec.forall(s => s.direction == Ascending &&
            s.nullOrdering == NullsFirst) &&
          isKeepFirst(cond, alias.toAttribute) =>
      // Spark's InferWindowGroupLimit may already have wedged a
      // sort-based WindowGroupLimit under the Window — strip it, the
      // aggregate needs no pre-sorted group limiting
      val child0 = child match {
        case WindowGroupLimit(_, _, _, _, inner) => inner
        case c => c
      }
      rewrite(partSpec, ordSpec, alias, child0)
  }

  private def rewrite(partSpec: Seq[Expression], ordSpec: Seq[SortOrder],
                      alias: Alias, child: LogicalPlan): LogicalPlan = {
      // Build the packed structs in a PROJECT below the aggregate, so
      // they are computed by whole-stage codegen; min_by_obj's
      // typed-imperative update() evaluates its children interpreted
      // per row, which for raw CreateStruct trees would re-introduce
      // the per-row expression cost the rewrite removes.
      val ordChildren = ordSpec.map(_.child)
      val partAttrs = partSpec.collect { case a: AttributeReference => a }
      // COMPACT form: when the sort keys + partition keys are plain
      // attributes covering every output column (the deterministic
      // full-row-tiebreak dedup shape), the ordering struct IS the row
      // — aggregate one struct via min_by_obj(ord, ord) (eval once,
      // copy once, half the shuffle width) and restore columns from
      // grouping keys / struct fields.
      val compact =
        ordChildren.forall(_.isInstanceOf[AttributeReference]) &&
        partSpec.forall(_.isInstanceOf[AttributeReference]) &&
        child.output.forall(a =>
          partAttrs.exists(_.exprId == a.exprId) ||
          ordChildren.exists(
            _.asInstanceOf[AttributeReference].exprId == a.exprId))
      val rnRestored =
        Alias(Literal(1), alias.name)(exprId = alias.exprId)
      if (compact) {
        val ordAlias0 = Alias(CreateStruct(ordChildren.toList),
          "__dedup_ord")()
        val packed = Project(child.output :+ ordAlias0, child)
        val rowAlias = Alias(
          MinByObj(ordAlias0.toAttribute, ordAlias0.toAttribute)
            .toAggregateExpression(), "__dedup_row")()
        val agg = Aggregate(partSpec,
          (partAttrs: Seq[NamedExpression]) :+ rowAlias, packed)
        val structAttr = rowAlias.toAttribute
        val restored = child.output.map { a =>
          if (partAttrs.exists(_.exprId == a.exprId)) a
          else {
            val idx = ordChildren.indexWhere(
              _.asInstanceOf[AttributeReference].exprId == a.exprId)
            Alias(GetStructField(structAttr, idx, Some(a.name)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
          }
        }
        Project(restored :+ rnRestored, agg)
      } else {
        val rowAlias0 = Alias(CreateStruct(child.output.toList),
          "__dedup_in")()
        val ordAlias0 = Alias(CreateStruct(ordChildren.toList),
          "__dedup_ord")()
        val packed = Project(child.output ++ Seq(rowAlias0, ordAlias0), child)
        val rowAlias = Alias(
          MinByObj(rowAlias0.toAttribute, ordAlias0.toAttribute)
            .toAggregateExpression(), "__dedup_row")()
        val agg = Aggregate(partSpec, Seq(rowAlias), packed)
        val structAttr = rowAlias.toAttribute
        val restored = child.output.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(structAttr, i, Some(a.name)), a.name)(
            exprId = a.exprId, qualifier = a.qualifier)
        }
        Project(restored :+ rnRestored, agg)
      }
  }
}
