package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized cross-checks for two more certified-by-example kernels:
  *
  *  - triangle counting vs brute-force closed-wedge enumeration on
  *    random graphs (dirty input: duplicates, self-loops, both
  *    orientations — cleaned by contract);
  *  - the TWO dedup forms (window row_number vs min_by_obj aggregate,
  *    compact AND general buffer paths) against each other and a
  *    straight-line reference, on tie-heavy frames with nulls — the
  *    (null_count, tiebreak) ordering is where the forms could
  *    silently diverge. */
@org.scalatest.tags.Slow
class DedupTrianglesFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("perNode triangles == brute-force closed wedges on seeded " +
      "random dirty graphs") {
    for ((seed, n, m) <- Seq((4L, 20, 70), (9L, 40, 120), (14L, 12, 60))) {
      val rnd = new Random(seed)
      val raw = (0 until m).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }
      val clean = raw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val adj = clean.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val nodes = clean.flatMap { case (a, b) => Seq(a, b) }
      val triangles = for {
        (a, b) <- clean.toSeq; c <- nodes
        if c > b && clean((b, c)) && clean((a, c))
      } yield (a, b, c)
      val expected = triangles.flatMap { case (a, b, c) => Seq(a, b, c) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = Triangles.perNode(raw.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected,
        s"seed=$seed: diff=${(got.toSet diff expected.toSet).take(5)} / " +
          s"${(expected.toSet diff got.toSet).take(5)}")
    }
  }

  private def refDedup(rows: Seq[(String, Option[Int], Option[Int], Long)])
      : Set[(String, Option[Int], Option[Int], Long)] =
    rows.groupBy(_._1).values.map { grp =>
      grp.minBy { case (_, v1, v2, id) =>
        (Seq(v1, v2).count(_.isEmpty), id) // null_count, then tiebreak id
      }
    }.toSet

  test("window dedup == min_by_obj dedup (general buffer) == " +
      "reference, on tie-heavy null-spiked frames") {
    for (seed <- Seq(3L, 11L, 27L)) {
      val rnd = new Random(seed)
      val rows = (0 until 400).map { i =>
        (s"k${rnd.nextInt(25)}",
          if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(5)),
          if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(5)),
          i.toLong)
      }
      val df = rows.toDF("k", "v1", "v2", "id")
      def collect(out: org.apache.spark.sql.DataFrame) =
        out.select("k", "v1", "v2", "id").collect().map(r =>
          (r.getString(0),
            if (r.isNullAt(1)) None else Some(r.getInt(1)),
            if (r.isNullAt(2)) None else Some(r.getInt(2)),
            r.getLong(3))).toSet
      val win = collect(Dedup.keepMostComplete(df, Seq("k"), Seq("id")))
      val agg = collect(Dedup.keepMostCompleteAgg(df, Seq("k"), Seq("id")))
      val exp = refDedup(rows)
      assert(win === exp, s"seed=$seed: window form diverged")
      assert(agg === exp, s"seed=$seed: aggregate form diverged")
    }
  }

  test("the compact min_by_obj path (all columns inside the ordering " +
      "struct) agrees too") {
    val rnd = new Random(8L)
    val rows = (0 until 300).map { i =>
      (s"k${rnd.nextInt(20)}", i.toLong)
    }
    val df = rows.toDF("k", "id")
    val win = Dedup.keepMostComplete(df, Seq("k"), Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val agg = Dedup.keepMostCompleteAgg(df, Seq("k"), Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exp = rows.groupBy(_._1).values.map(_.minBy(_._2)).toSet
    assert(win === exp && agg === exp)
  }
}
