package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Nearest-centroid train + score vs a straight-line integer replay
  * on random labeled vectors — negative components included (the
  * floor-division identity `(s - pmod(s, n)) div n` is exactly where
  * a sign bug would hide), ties resolved to the smaller label. */
@org.scalatest.tags.Slow
class ClassifyFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def floorDiv(s: Long, n: Long): Long = Math.floorDiv(s, n)

  test("centroid train/score == integer reference on random labeled " +
      "vectors with negative components (3 seeds)") {
    for (seed <- Seq(7L, 16L, 29L)) {
      val rnd = new Random(seed)
      val dim = 6
      val labels = 0L until 4L
      def vec(): Seq[Long] = Seq.fill(dim)((rnd.nextInt(41) - 20).toLong)
      val train = (0 until 120).map(_ =>
        (labels(rnd.nextInt(labels.size)), vec()))
      val test = (0L until 60L).map(id => (id, vec()))

      // reference: exact floor-mean centroids, exact squared-L2 argmin
      val centroids = train.groupBy(_._1).view.mapValues { rows =>
        (0 until dim).map { d =>
          val s = rows.map(_._2(d)).sum
          floorDiv(s, rows.size.toLong)
        }
      }.toMap
      def l2sq(a: Seq[Long], b: Seq[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val expected = test.map { case (id, v) =>
        id -> centroids.toSeq.sortBy(_._1)
          .minBy { case (lab, cv) => (l2sq(cv, v), lab) }._1
      }.toMap

      val model = Classify.centroidModel(
        train.toDF("label", "qv"), "label", "qv")
      assert(model.map(_._1) === centroids.keys.toSeq.sorted,
        s"seed=$seed: label set diverged")
      model.foreach { case (lab, cv) =>
        assert(cv === centroids(lab),
          s"seed=$seed label=$lab: centroid diverged")
      }
      val got = test.toDF("id", "qv")
        .select(col("id"),
          Classify.centroidAssignCol(model, col("qv")).getField("lab")
            .as("pred"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed: assignment diverged")
    }
  }
}
