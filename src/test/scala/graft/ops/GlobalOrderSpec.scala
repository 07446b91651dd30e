package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GlobalOrder's prefix-scan results must equal the single-partition
  * window formulations they replace — checked against brute force on
  * seeded random data, including partition-boundary cases. */
class GlobalOrderSpec extends SparkSpec {

  test("withGlobalIndex equals row_number over the global order") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicate sort values on purpose: the id tiebreak makes it total
    val rows = (0L until 5000L).map(i => (i, rnd.nextInt(40).toLong))
    val df = rows.toDF("id", "k").repartition(7)
    val got = GlobalOrder
      .withGlobalIndex(df, Seq(col("k").asc, col("id").asc))
      .select("idx", "id", "k")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val want = rows.sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, k), i) => (i.toLong, id, k) }
    assert(got.toSeq == want)
  }

  test("withGlobalIndex on empty input returns empty") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "k")
    assert(GlobalOrder.withGlobalIndex(df, Seq(col("k"))).count() == 0L)
  }

  test("skylineMin2D equals the NOT-EXISTS dominance definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // clustered points so the frontier is nontrivial; includes exact
    // duplicates (must all be represented once: distinct-point output)
    val pts = (0 until 4000).map { _ =>
      val x = rnd.nextInt(200).toLong
      (x, (rnd.nextInt(200) - x / 2 + 100).toLong)
    }
    val df = pts.toDF("x", "y").repartition(5)
    val got = GlobalOrder.skylineMin2D(df, "x", "y")
      .as[(Long, Long)].collect().toSet
    val d = pts.distinct
    val want = d.filter { case (x, y) =>
      !d.exists { case (qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y)
      }
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("skylineMin2D: dominated duplicates drop, frontier ties stay") {
    import spark.implicits._
    // (1,5) and (5,1) both on frontier; (1,5) duplicated; (2,5)
    // dominated by (1,5); (1,6) dominated by (1,5)
    val df = Seq((1L, 5L), (1L, 5L), (5L, 1L), (2L, 5L), (1L, 6L))
      .toDF("x", "y")
    val got = GlobalOrder.skylineMin2D(df, "x", "y")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 5L), (5L, 1L)))
  }

  test("skylineMin2D ignores null dims") {
    import spark.implicits._
    val df = Seq((Some(1L), Some(5L)), (None, Some(0L)), (Some(0L), None))
      .toDF("x", "y")
    val got = GlobalOrder.skylineMin2D(df, "x", "y")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 5L)))
  }
}
