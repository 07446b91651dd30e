package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Misra-Gries guarantee must hold under Spark's arbitrary
  * partial-aggregation merge order: every item with frequency above
  * n/(k+1) is present, and estimates undercount by at most n/(k+1).
  * Checked on seeded zipf-ish data across several partitionings, plus
  * a direct driver-side merge-order property. */
class MisraGriesSpec extends SparkSpec {

  private def exact(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  private def checkGuarantee(xs: Seq[Long], k: Int,
                             got: Map[Long, Long]): Unit = {
    val n = xs.length.toLong
    val bound = n / (k + 1)
    assert(got.size <= k, s"summary exceeded k: ${got.size}")
    exact(xs).foreach { case (key, cnt) =>
      val est = got.getOrElse(key, 0L)
      assert(est <= cnt, s"overcount for $key: est=$est cnt=$cnt")
      if (cnt > bound)
        assert(got.contains(key), s"heavy item $key (cnt=$cnt) missing")
      assert(cnt - est <= bound,
        s"undercount beyond bound for $key: cnt=$cnt est=$est bound=$bound")
    }
  }

  private def data(seed: Int, n: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      if (rnd.nextInt(3) == 0) rnd.nextInt(4).toLong // 4 hot keys
      else 1000L + rnd.nextInt(n)                    // long uniform tail
    }
  }

  test("guarantee holds under Spark partial aggregation, several " +
      "partitionings") {
    import spark.implicits._
    val xs = data(3, 30000)
    for (parts <- Seq(1, 3, 16)) {
      val mg = new MisraGriesAgg(16)
      val got = xs.toDF("x").repartition(parts).as[Long]
        .select(mg.toColumn.name("mg")).head()
      checkGuarantee(xs, 16, got)
    }
  }

  test("guarantee holds under adversarial driver-side merge orders") {
    val k = 8
    val xs = data(7, 5000)
    val rnd = new scala.util.Random(9)
    for (_ <- 0 until 5) {
      val mg = new MisraGriesAgg(k)
      val chunks = rnd.shuffle(xs.grouped(137).toSeq)
      val partials = chunks.map(_.foldLeft(mg.zero)(mg.reduce))
      val merged = rnd.shuffle(partials).reduce(mg.merge)
      checkGuarantee(xs, k, merged)
    }
  }

  test("small domains are exact") {
    val mg = new MisraGriesAgg(8)
    val xs = Seq.fill(100)(Seq(1L, 2L, 2L, 3L)).flatten
    val got = xs.foldLeft(mg.zero)(mg.reduce)
    assert(got == Map(1L -> 100L, 2L -> 200L, 3L -> 100L))
  }
}
