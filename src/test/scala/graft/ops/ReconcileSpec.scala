package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("tableChecksum: order-insensitive, null-vs-empty distinguished") {
    val a = Seq((1L, Some("x")), (2L, Some("y")), (3L, None))
      .toDF("k", "v")
    val shuffled = Seq((3L, Option.empty[String]), (1L, Some("x")),
      (2L, Some("y"))).toDF("k", "v").repartition(3)
    val cols = Seq("k", "v")
    assert(Reconcile.checksumDiff(a, shuffled, cols, 16).count() == 0,
      "same content in different order must checksum equal")
    val nullVsEmpty = Seq((1L, Some("x")), (2L, Some("y")),
      (3L, Some(""))).toDF("k", "v")
    assert(Reconcile.checksumDiff(a, nullVsEmpty, cols, 16).count() > 0,
      "NULL and empty string must digest differently")
  }

  test("checksumDiff localizes modifications, insertions, deletions") {
    val base = (1L to 1000L).map(i => (i, i * 7)).toDF("k", "v")
    val drifted = (1L to 1000L).filter(_ != 500L) // delete one
      .map(i => (i, if (i == 17L) -1L else i * 7)) // modify one
      .toDF("k", "v")
    val diff = Reconcile.checksumDiff(base, drifted, Seq("k", "v"), 32)
      .collect()
    // 2 changed rows land in at most 3 buckets (17's old+new digests
    // may differ in bucket), and at least 1
    assert(diff.nonEmpty && diff.length <= 4, diff.mkString("\n"))
    // every reported bucket genuinely disagrees
    assert(diff.forall(r => r.getLong(1) != r.getLong(2) ||
      r.getLong(3) != r.getLong(4) || r.getLong(5) != r.getLong(6)))
    // identical inputs -> empty diff
    assert(Reconcile.checksumDiff(base, base, Seq("k", "v"), 32)
      .count() == 0)
  }

  test("incremental agg state: merge(hist, batch) == full recompute; " +
      "finalize derives exact milli means") {
    val rows = (1L to 100L).map(i =>
      (if (i % 2 == 0) "a" else "b", i, i * 3)).toDF("g", "x", "y")
    val hist = rows.filter($"x" <= 60)
    val batch = rows.filter($"x" > 60)
    val keys = Seq("g")
    val merged = IncrementalAgg.mergeStates(
      Seq(IncrementalAgg.aggState(hist, keys, Seq("x", "y")),
        IncrementalAgg.aggState(batch, keys, Seq("x", "y"))), keys)
    val full = IncrementalAgg.aggState(rows, keys, Seq("x", "y"))
    assert(merged.orderBy("g").collect().toSeq ==
      full.orderBy("g").collect().toSeq)
    val view = IncrementalAgg.finalizeView(merged, keys)
      .orderBy("g").collect()
    // group a: 50 evens 2..100, sum=2550, avg=51 -> 51000 milli
    assert(view.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(4))).toSeq == Seq(
      ("a", 50L, 2550L, 51000L),
      ("b", 50L, 2500L, 50000L)))
  }
}
