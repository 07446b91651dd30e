package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized checks for the exchange-free global-order kernels —
  * both replace a single-partition window with range partitioning +
  * driver-side prefix folds over PARTITION aggregates, so the bug
  * surface is the partition bookkeeping (empty partitions, boundary
  * rows), which deterministic small fixtures under-exercise:
  *
  *  - [[GlobalOrder.withGlobalIndex]] == `row_number() - 1` along the
  *    same total order;
  *  - [[GlobalOrder.skylineMin2D]] == the NOT-EXISTS dominance
  *    definition over distinct points. */
@org.scalatest.tags.Slow
class GlobalOrderFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("withGlobalIndex == sort-position reference on random frames " +
      "(duplicate sort values broken by a unique id)") {
    for (seed <- Seq(2L, 12L)) {
      val rnd = new Random(seed)
      val rows = (0 until 700).map { i =>
        (rnd.nextInt(40).toLong, i.toLong) // heavy ties on the sort key
      }
      val got = GlobalOrder.withGlobalIndex(
          rows.toDF("v", "id"), Seq(col("v").asc, col("id").asc))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
      val exp = rows.sortBy(t => (t._1, t._2)).zipWithIndex
        .map { case ((_, id), pos) => id -> pos.toLong }.toMap
      assert(got === exp, s"seed=$seed: global index diverged")
    }
  }

  test("skylineMin2D == NOT-EXISTS dominance on random point clouds " +
      "(duplicates and shared coordinates planted)") {
    for (seed <- Seq(4L, 18L)) {
      val rnd = new Random(seed)
      val pts = (0 until 500).map { _ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
      }
      val distinct = pts.distinct
      val exp = distinct.filter { case (x, y) =>
        !distinct.exists { case (qx, qy) =>
          qx <= x && qy <= y && (qx < x || qy < y)
        }
      }.toSet
      val got = GlobalOrder.skylineMin2D(pts.toDF("x", "y"), "x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === exp,
        s"seed=$seed: extra=${(got diff exp).take(5)} " +
          s"missing=${(exp diff got).take(5)}")
    }
  }
}
