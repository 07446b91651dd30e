package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, AttributeSet, BindReferences, Expression,
  GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst integration of the backward as-of join —
  * SURVEY §7.5 escalation path (c): a custom `LogicalPlan` + `SparkStrategy`
  * + physical `SparkPlan`, the rung below composing built-ins
  * ([[graft.ops.Joins.asofJoinBackward]], the union-tag + window form)
  * and above `mapPartitions`.
  *
  * Semantics (standard ASOF JOIN LEFT, e.g. the one DuckDB/kdb expose):
  * for every left row, attach the payload of the single right row with
  * the same key and the greatest right.time <= left.time — ties on time
  * broken by the greatest `tiebreak`, no match => null payload. ROW-level
  * semantics: the chosen row's payload is taken as-is (a null payload
  * field stays null), and NULL keys/times never match — unlike the
  * union-window form, whose `last(c, ignoreNulls)` falls back per-COLUMN
  * and whose window groups null keys together. The two agree whenever
  * keys, times, and payloads are non-null.
  *
  * Physical strategy — broadcast hash+sorted-array lookup: the build
  * (right) side is collected, grouped by key, each group sorted by
  * (time, tiebreak) once, and the map broadcast; the probe (left) side
  * then streams with NO shuffle and NO sort, each row doing one hash
  * lookup + binary search (O(log group)). The union-window form costs a
  * full shuffle + sort of BOTH sides on (key, time); this exec trades
  * that for a dim-sized broadcast — exactly the BroadcastHashJoin /
  * SortMergeJoin trade, applied to as-of. Use it when the right side is
  * dimension-sized (event-state snapshots, rate tables, config
  * histories); use the union-window form when both sides are
  * fact-sized. Left's partitioning is preserved (`outputPartitioning`
  * delegates), so downstream ops reuse upstream layout. */
case class BroadcastAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    tiebreak: Seq[Attribute],
    payloadOut: Seq[AttributeReference]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut is GENERATED here, not consumed: keep it out of
  // `references` so CheckAnalysis' missingInput stays empty
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[BroadcastAsOfJoin]] as [[BroadcastAsOfJoinExec]]. Injected at
  * build time by [[graft.GraftExtensions]] (injectPlannerStrategy) and at
  * runtime through `spark.experimental.extraStrategies` by
  * [[graft.ops.Joins.asofJoinBroadcast]] — same object both paths. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: BroadcastAsOfJoin =>
      BroadcastAsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.rightKey, j.leftTime, j.rightTime,
        j.payload, j.tiebreak, j.payloadOut) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join over a broadcast build side.
  *
  * Build: one `executeCollect` of the (already column-pruned) right
  * child; rows with null key or time are dropped (they can never win a
  * `<=` comparison under join null semantics); each key's entries are
  * sorted by (time, tiebreak...) ascending and payloads pre-projected to
  * compact UnsafeRows, so the broadcast carries only (time, tiebreak,
  * payload), not full build rows.
  *
  * Probe: `mapPartitionsInternal` — per row one hash lookup, one binary
  * search for the last entry with time <= t, one UnsafeProjection. No
  * exchange, no sort, no per-row allocation beyond the output row.
  * Not codegen'd (no CodegenSupport): the per-row work is a hash probe
  * + binary search over broadcast state, which whole-stage codegen
  * cannot fuse into the scan loop anyway; the projection boundary is
  * where the stage breaks, same as BroadcastNestedLoopJoinExec. */
case class BroadcastAsOfJoinExec(
    streamed: SparkPlan,
    build: SparkPlan,
    streamKey: Attribute,
    buildKey: Attribute,
    streamTime: Attribute,
    buildTime: Attribute,
    payload: Seq[Attribute],
    tiebreak: Seq[Attribute],
    payloadOut: Seq[Attribute]) extends BinaryExecNode {

  override def left: SparkPlan = streamed
  override def right: SparkPlan = build
  override def output: Seq[Attribute] = streamed.output ++ payloadOut

  // pass-through: as-of enrich adds columns, never moves rows
  override def outputPartitioning = streamed.outputPartitioning
  override def outputOrdering = streamed.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(streamed = newLeft, build = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    // ascribe to Expression: bindReference[A] casts its result back to
    // A, and binding an Attribute yields a BoundReference
    val bKey = BindReferences.bindReference(buildKey: Expression, build.output)
    val bTime = BindReferences.bindReference(buildTime: Expression, build.output)
    val bTies = tiebreak.map(t =>
      BindReferences.bindReference(t: Expression, build.output))
    val payloadProj = UnsafeProjection.create(payload, build.output)
    val timeOrd = TypeUtils.getInterpretedOrdering(buildTime.dataType)
    val tieOrds =
      tiebreak.map(t => TypeUtils.getInterpretedOrdering(t.dataType))

    // ascending (time, tiebreak...) with Spark's asc NULLS FIRST for
    // tiebreaks — the last element <= t is then the union-window winner
    val entryOrd: Ordering[(Any, Array[Any], UnsafeRow)] =
      new Ordering[(Any, Array[Any], UnsafeRow)] {
        override def compare(x: (Any, Array[Any], UnsafeRow),
                             y: (Any, Array[Any], UnsafeRow)): Int = {
          var c = timeOrd.compare(x._1, y._1)
          var i = 0
          while (c == 0 && i < tieOrds.length) {
            c = (x._2(i), y._2(i)) match {
              case (null, null) => 0
              case (null, _) => -1
              case (_, null) => 1
              case (a, b) => tieOrds(i).compare(a, b)
            }
            i += 1
          }
          c
        }
      }

    val grouped =
      mutable.HashMap.empty[Any, mutable.ArrayBuffer[(Any, Array[Any], UnsafeRow)]]
    // executeCollect returns freshly deserialized rows the map may hold
    // references into (UTF8String keys point at row buffers) — safe, the
    // rows stay live exactly as long as the map
    build.executeCollect().foreach { row =>
      val k = bKey.eval(row)
      if (k != null) {
        val t = bTime.eval(row)
        if (t != null) {
          grouped.getOrElseUpdate(k, mutable.ArrayBuffer.empty) +=
            ((t, bTies.map(_.eval(row)).toArray, payloadProj(row).copy()))
        }
      }
    }
    val built: Map[Any, (Array[Any], Array[UnsafeRow])] =
      grouped.iterator.map { case (k, buf) =>
        val sorted = buf.sorted(entryOrd)
        k -> (sorted.map(_._1).toArray, sorted.map(_._3).toArray)
      }.toMap
    val bc = sparkContext.broadcast(built)

    val sKey =
      BindReferences.bindReference(streamKey: Expression, streamed.output)
    val sTime =
      BindReferences.bindReference(streamTime: Expression, streamed.output)
    val payloadArity = payloadOut.size
    val outAttrs = output
    val streamAttrs = streamed.output
    val pOut = payloadOut
    streamed.execute().mapPartitions({ iter =>
      val m = bc.value
      val joined = new JoinedRow
      val nullRow = new GenericInternalRow(payloadArity)
      val resultProj = UnsafeProjection.create(outAttrs, streamAttrs ++ pOut)
      iter.map { row =>
        var payloadRow: InternalRow = nullRow
        val k = sKey.eval(row)
        if (k != null) {
          val hit = m.getOrElse(k, null)
          if (hit != null) {
            val t = sTime.eval(row)
            if (t != null) {
              val times = hit._1
              // first index with times(i) > t; predecessor is the match
              var lo = 0
              var hi = times.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (timeOrd.compare(times(mid), t) <= 0) lo = mid + 1
                else hi = mid
              }
              if (lo > 0) payloadRow = hit._2(lo - 1)
            }
          }
        }
        resultProj(joined(row, payloadRow))
      }
    }, preservesPartitioning = true)
  }
}
