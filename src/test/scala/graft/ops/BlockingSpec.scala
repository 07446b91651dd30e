package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sorted-neighborhood pairs must equal the brute-force definition:
  * all (a, b) whose positions in the global (key, id) sort are within
  * window-1 of each other, a before b — including across partition
  * boundaries of the underlying range sort. */
class BlockingSpec extends SparkSpec {

  test("pairs equal the positional definition on seeded data") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0L until 800L).map { i =>
      (i, f"k${rnd.nextInt(50)}%03d") // heavy key ties -> id tiebreak
    }
    val df = rows.toDF("id", "key").repartition(6)
    val w = 5
    val got = Blocking
      .sortedNeighborhoodPairs(df, "id", Seq(col("key")), window = w)
      .as[(Long, Long)].collect().toSet
    val order = rows.sortBy { case (id, k) => (k, id) }.map(_._1)
    val want = (for {
      i <- order.indices
      j <- (i + 1) until math.min(i + w, order.length)
    } yield (order(i), order(j))).toSet
    assert(got == want)
    assert(got.size == want.size)
  }

  test("window=2 yields exactly the adjacent chain") {
    import spark.implicits._
    val df = Seq((10L, "b"), (20L, "a"), (30L, "c")).toDF("id", "key")
    val got = Blocking
      .sortedNeighborhoodPairs(df, "id", Seq(col("key")), window = 2)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((20L, 10L), (10L, 30L)))
  }
}
