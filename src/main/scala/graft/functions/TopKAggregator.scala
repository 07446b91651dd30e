package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k largest (value, id) pairs,
  * ordered value DESC then id ASC (deterministic ties) — the typed
  * `Aggregator` extension surface (SURVEY.md §2.10).
  *
  * Scale rationale: the window form (`row_number().over(partitionBy
  * ... orderBy ...)` + filter) shuffles and SORTS every row of every
  * group; this aggregator is partial-aggregable — each map task ships
  * at most k pairs per group, the shuffle carries k·groups rows
  * instead of all rows, and nothing is globally sorted. At 100 TB
  * with hot groups that is the difference between a bounded merge and
  * a spilling sort. */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)],
      Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, Long)],
                     x: (Double, Long)): List[(Double, Long)] = {
    val (ge, lt) = buf.span(better(_, x))
    (ge ::: (x :: lt)).take(k)
  }

  override def zero: List[(Double, Long)] = Nil
  override def reduce(b: List[(Double, Long)],
                      a: (Double, Long)): List[(Double, Long)] =
    insert(b, a)
  override def merge(x: List[(Double, Long)],
                     y: List[(Double, Long)]): List[(Double, Long)] =
    y.foldLeft(x)(insert)
  override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  /** Untyped column form: `topK(3)(col(value), col(id))` yields an
    * array<struct<_1:double,_2:bigint>> of the k best pairs. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
}
