package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized equivalences for the incremental-maintenance and skew
  * kernels:
  *
  *  - [[Merge.applyCdc]] vs a straight-line per-key fold of the
  *    change log (latest-by-ord wins, 'D' suppresses, untouched keys
  *    pass) on random out-of-order logs with delete/update churn —
  *    the max_by_obj compaction is where a buffer bug would silently
  *    resurrect deleted rows;
  *  - [[Skew.saltedSum]] vs the plain one-shuffle groupBy sum on
  *    heavy-skew key distributions — salting must be a pure plan
  *    transformation, never a value change. */
@org.scalatest.tags.Slow
class MergeSkewFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("applyCdc == per-key latest-wins fold on random out-of-order " +
      "change logs (3 seeds)") {
    for (seed <- Seq(2L, 15L, 33L)) {
      val rnd = new Random(seed)
      val snapKeys = (0 until 40).map(i => s"k$i")
      val snapshot = snapKeys.zipWithIndex.map { case (k, i) =>
        (k, i * 10L)
      }
      // changes over a WIDER key space (inserts of unseen keys too),
      // change ids shuffled so log order is not ord order
      val changes = rnd.shuffle((0 until 120).map { c =>
        val k = s"k${rnd.nextInt(60)}"
        val op = if (rnd.nextInt(4) == 0) "D" else "U"
        (k, rnd.nextInt(1000).toLong, op, c.toLong)
      })
      val got = Merge.applyCdc(
          snapshot.toDF("k", "v"),
          changes.toDF("k", "v", "op", "cid"),
          keys = Seq("k"), ordCols = Seq("cid"), opCol = "op")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val latest = changes.groupBy(_._1).view
        .mapValues(_.maxBy(_._4)).toMap
      val exp = (snapshot.filterNot { case (k, _) => latest.contains(k) } ++
        latest.values.collect { case (k, v, "U", _) => (k, v) }).toSet
      assert(got === exp,
        s"seed=$seed: diff=${(got diff exp).take(5)} / " +
          s"${(exp diff got).take(5)}")
    }
  }

  test("saltedSum == plain groupBy sum on heavy-skew distributions") {
    for ((seed, salt) <- Seq((5L, 4), (9L, 16))) {
      val rnd = new Random(seed)
      // 80% of rows on one hot key, the rest across 30 cold keys
      val rows = (0 until 2000).map { _ =>
        val k = if (rnd.nextInt(5) < 4) "hot" else s"c${rnd.nextInt(30)}"
        (k, rnd.nextInt(100).toLong)
      }
      val df = rows.toDF("k", "v")
      val got = Skew.saltedSum(df, Seq("k"), "v", salt)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exp = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(got === exp, s"seed=$seed salt=$salt: salted sum diverged")
    }
  }
}
