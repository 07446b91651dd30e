package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic bounded reservoir (bottom-k-by-priority) sample — the
  * unknown-n, single-pass sibling of
  * [[graft.ops.Corpus.stratifiedHashSample]]: keeps the k pairs with
  * the SMALLEST priorities (ties to the smaller id), where the caller
  * supplies priority = md5(id ‖ seed). Since "k smallest of a
  * multiset" is associative and commutative, the state is
  * MERGE-INVARIANT: any partitioning, any merge order, any arrival
  * order yields the same sample — which is what makes the sample
  * reproducible on a cluster and valid under streaming partial
  * aggregation. With a uniform hash this is a uniform
  * without-replacement sample (bottom-k sketch semantics); varying the
  * seed varies the draw.
  *
  * Scale rationale (same as [[TopKAggregator]]): the window form
  * (`row_number() over (partition by strata order by md5)`) sorts
  * every row of every group; this aggregator is partial-aggregable —
  * each map task ships at most k pairs per group and nothing is
  * globally sorted. The window twin stays the ORACLE formulation: both
  * compute the identical sample, which the gate pins cross-engine. */
class ReservoirAgg(k: Int)
    extends Aggregator[(String, Long), List[(String, Long)],
      Seq[(String, Long)]] {
  require(k >= 1, "k must be >= 1")

  private def before(a: (String, Long), b: (String, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(String, Long)],
                     x: (String, Long)): List[(String, Long)] = {
    val (lt, ge) = buf.span(before(_, x))
    (lt ::: (x :: ge)).take(k)
  }

  override def zero: List[(String, Long)] = Nil
  override def reduce(b: List[(String, Long)],
                      a: (String, Long)): List[(String, Long)] =
    insert(b, a)
  override def merge(x: List[(String, Long)],
                     y: List[(String, Long)]): List[(String, Long)] =
    y.foldLeft(x)(insert)
  override def finish(b: List[(String, Long)]): Seq[(String, Long)] = b

  override def bufferEncoder: Encoder[List[(String, Long)]] =
    ExpressionEncoder[List[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object ReservoirAgg {
  /** Untyped column form: `reservoir(20)(priorityCol, idCol)` yields
    * an array<struct<_1:string,_2:bigint>> of the k sampled pairs in
    * priority order. */
  def reservoir(k: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new ReservoirAgg(k),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
}
