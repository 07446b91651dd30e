package graft.ops

import graft.SparkSpec

/** Delta-join MV maintenance: the three-term expansion must equal the
  * full recompute, with every term class populated — a key only in ΔA
  * matching old B, only in ΔB matching old A, in BOTH deltas (the
  * ΔA ⋈ ΔB term the naive two-term expansion forgets), and unmatched
  * keys on each side. */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("three-term delta expansion equals the full recompute") {
    val aOld = Seq((1L, "a1"), (2L, "a2"), (9L, "a9"))
      .toDF("k", "a_payload")
    val dA = Seq((3L, "a3"), (4L, "a4x"), (4L, "a4y"))
      .toDF("k", "a_payload")
    val bOld = Seq((1L, "b1"), (3L, "b3"), (8L, "b8"))
      .toDF("k", "b_payload")
    val dB = Seq((2L, "b2"), (4L, "b4"))
      .toDF("k", "b_payload")
    val jOld = aOld.join(bOld, Seq("k"))

    val incr = IncrementalJoin
      .deltaJoinInserts(jOld, aOld, dA, bOld, dB, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted
    val full = aOld.unionByName(dA).join(bOld.unionByName(dB), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted

    assert(incr.toSeq == full.toSeq)
    // sanity: every term class actually fired
    val keys = incr.map(_._1).toSet
    assert(keys == Set(1L, 2L, 3L, 4L))             // 8, 9 unmatched
    assert(incr.count(_._1 == 4L) == 2)             // ΔA ⋈ ΔB, dup payloads
  }

  test("empty deltas reduce to the old view") {
    val aOld = Seq((1L, "a1")).toDF("k", "a_payload")
    val bOld = Seq((1L, "b1")).toDF("k", "b_payload")
    val empty = aOld.limit(0)
    val emptyB = bOld.limit(0)
    val out = IncrementalJoin.deltaJoinInserts(
      aOld.join(bOld, Seq("k")), aOld, empty, bOld, emptyB, Seq("k"))
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
