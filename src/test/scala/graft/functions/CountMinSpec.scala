package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min Sketch guarantees: partitioning-independence (commutative
  * counter merges), exactness on a collision-free domain, and the
  * one-sided error bound on a high-cardinality domain. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val cms = new CountMinSketchAgg(depth = 4, width = 1024)

  private def sketchOf(xs: Seq[Long], parts: Int): Array[Long] =
    xs.toDF("x").repartition(parts).as[Long]
      .select(cms.toColumn.name("s")).head()

  test("merge order does not change the sketch (commutative sums)") {
    val xs = (1L to 5000L).map(i => i % 37)
    assert(sketchOf(xs, 1).toSeq == sketchOf(xs, 13).toSeq)
  }

  test("estimates are exact on a collision-free small domain") {
    val xs = Seq.fill(10)(1L) ++ Seq.fill(25)(2L) ++ Seq.fill(7)(3L)
    val s = sketchOf(xs, 4)
    assert(cms.estimate(s, 1L) == 10L)
    assert(cms.estimate(s, 2L) == 25L)
    assert(cms.estimate(s, 3L) == 7L)
    assert(cms.estimate(s, 99L) == 0L)
  }

  test("invalid dimensions are rejected at construction") {
    intercept[IllegalArgumentException](new CountMinSketchAgg(0, 1024))
    intercept[IllegalArgumentException](new CountMinSketchAgg(4, 0))
    intercept[IllegalArgumentException](new CountMinSketchAgg(7, 1024))
  }

  test("power-of-two width spreads keys that share low bits") {
    // keys differing ONLY above bit 11 (width 2048 = 2^11): the old
    // multiply-mod hash sent all of these to the same cell in every
    // row; a full-avalanche per-row hash must separate most of them
    val c = new CountMinSketchAgg(depth = 4, width = 2048)
    val keys = (0 until 64).map(i => i.toLong << 20)
    val cells = keys.map(k => (0 until 4).map(d => c.cell(d, k)))
    assert(cells.distinct.size > 56,
      s"only ${cells.distinct.size}/64 distinct cell vectors")
  }

  test("estimate is never below the true count (one-sided error)") {
    // 2000 distinct keys in a 1024-wide sketch: collisions certain,
    // but min-across-depth must never undershoot
    val xs = (1L to 2000L).flatMap(i => Seq.fill((i % 5).toInt + 1)(i))
    val s = sketchOf(xs, 8)
    val exact = xs.groupBy(identity).map { case (k, v) => k -> v.size }
    exact.foreach { case (k, n) =>
      assert(cms.estimate(s, k) >= n, s"undershoot for key $k")
    }
  }
}
