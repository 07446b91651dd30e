package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized LSM-lifecycle equivalence for the persisted inverted
  * index: an arbitrary interleaving of append / takedown (including
  * re-delivered and never-ingested ids) / compact must answer
  * retracted-BM25 queries EXACTLY like a store built from scratch on
  * the surviving documents — the property the single-scenario specs
  * (InvertedIndexStoreSpec, TakedownSpec) pin once, here run over
  * seeded random operation sequences the store never saw in
  * development. Fixed seeds — failures reproduce. */
@org.scalatest.tags.Slow
class StoreLifecycleFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Array("join", "filter", "scan", "merge", "sort",
    "index", "probe", "shard", "spill", "fuse")

  private def docText(rnd: Random): String =
    (0 until 3 + rnd.nextInt(9)).map(_ => vocab(rnd.nextInt(vocab.length)))
      .mkString(" ")

  private def answers(table: String): Seq[(Int, Long, Long)] =
    InvertedIndexStore.bm25FromStoreRetracted(spark, table,
        Seq("join", "scan", "spill"), k = 25)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

  test("random append/takedown/compact interleavings answer like a " +
      "from-scratch build on the surviving docs (2 seeds x 6 steps)") {
    for (seed <- Seq(5L, 19L)) {
      val rnd = new Random(seed)
      val t = s"lsf_idx_$seed"
      val ref = s"lsf_ref_$seed"
      Compaction.dropManagedTable(spark,
        InvertedIndexStore.tombstoneTable(t))
      var nextId = 0L
      var corpus = Map.empty[Long, String] // every ingested doc
      var live = Set.empty[Long]           // minus takedowns
      def newBatch(n: Int): Seq[(Long, String)] = {
        val b = (0 until n).map { _ =>
          val id = nextId; nextId += 1; (id, docText(rnd))
        }
        corpus ++= b; live ++= b.map(_._1)
        b
      }
      val first = newBatch(8)
      InvertedIndexStore.build(first.toDF("doc_id", "text"),
        "doc_id", "text", t, overwrite = true)
      for (_ <- 1 to 6) rnd.nextInt(3) match {
        case 0 =>
          val b = newBatch(3 + rnd.nextInt(5))
          InvertedIndexStore.append(b.toDF("doc_id", "text"),
            "doc_id", "text", t)
        case 1 =>
          // random subset of INGESTED ids: live ones retract, already
          // -removed ones re-deliver (idempotent), plus one id never
          // ingested (a takedown for a doc this store never had must
          // be harmless)
          val ids = rnd.shuffle(corpus.keys.toSeq)
            .take(1 + rnd.nextInt(4)) :+ 999999L
          InvertedIndexStore.takedown(ids.toDF("id"), t)
          live --= ids
        case 2 =>
          InvertedIndexStore.compactTombstones(spark, t)
      }
      val lived = answers(t)
      // ground truth: a store that only ever saw the survivors
      InvertedIndexStore.build(
        corpus.filter { case (id, _) => live(id) }.toSeq
          .toDF("doc_id", "text"),
        "doc_id", "text", ref, overwrite = true)
      assert(lived === answers(ref),
        s"seed=$seed: lifecycle store diverged from rebuild " +
          s"(live=${live.size}/${corpus.size})")
      assert(!lived.exists(r => !live(r._2)),
        s"seed=$seed: a retracted doc answered")
      // and the state is still serviceable: one more compact + query
      InvertedIndexStore.compactTombstones(spark, t)
      assert(answers(t) === lived,
        s"seed=$seed: final compaction moved an answer")
    }
  }
}
