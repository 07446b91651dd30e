package graft.ops

import graft.SparkSpec

/** Hand-worked cases for the per-prompt preference exports
  * (KTO-style unpaired labels, best-of-n selection). */
class PrefExportSpec extends SparkSpec {
  import spark.implicits._

  // prompt 10: {1,2,3} all duel; prompt 20: {1,2}; prompt 30: {5,5}?
  // no — prompt 30 gets a single self-pair participant via (5,6) with
  // 6 unseen elsewhere.
  private val duels = Seq(
    (10L, 1L, 2L, true), (10L, 2L, 3L, false), (10L, 1L, 3L, false),
    (20L, 1L, 2L, false),
    (30L, 5L, 6L, true)
  ).toDF("ok", "i", "j", "awin")

  private val scores = Seq(
    (1L, 100L), (2L, 200L), (3L, 300L), (5L, 50L), (6L, 40L)
  ).toDF("id", "bt")

  test("ktoLabels: desirable = score strictly above the per-prompt " +
      "lower median (rank ceil(n/2) by score, id)") {
    val out = BradleyTerry.ktoLabels(duels, scores)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // prompt 10: n=3, median rank 2 -> med=200; only id 3 above
    assert(out((10L, 1L)) == (100L, 0L))
    assert(out((10L, 2L)) == (200L, 0L)) // equal to median: NOT above
    assert(out((10L, 3L)) == (300L, 1L))
    // prompt 20: n=2, LOWER median rank 1 -> med=100; id 2 above
    assert(out((20L, 1L)) == (100L, 0L))
    assert(out((20L, 2L)) == (200L, 1L))
    // prompt 30: n=2 -> med=40; 5 above
    assert(out((30L, 6L)) == (40L, 0L))
    assert(out((30L, 5L)) == (50L, 1L))
    assert(out.size == 7)
  }

  test("bestOfN: argmax per prompt with runner-up margin; ties break " +
      "by id; single-response prompts dropped") {
    val out = BradleyTerry.bestOfN(duels, scores)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(10L) == (3L, 300L, 100L, 3L)) // 300 over 200, n=3
    assert(out(20L) == (2L, 200L, 100L, 2L))
    assert(out(30L) == (5L, 50L, 10L, 2L))
    assert(out.size == 3)
  }

  test("bestOfN tie on score selects the smaller id and margin 0") {
    val d = Seq((7L, 1L, 2L, true)).toDF("ok", "i", "j", "awin")
    val sc = Seq((1L, 500L), (2L, 500L)).toDF("id", "bt")
    val r = BradleyTerry.bestOfN(d, sc).collect().head
    assert(r.getLong(1) == 1L && r.getLong(3) == 0L)
  }
}
