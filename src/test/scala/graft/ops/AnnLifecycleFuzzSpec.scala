package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The [[StoreLifecycleFuzzSpec]] property on the OTHER persisted
  * store family: random append / takedown / compact interleavings
  * over the sign-LSH ANN index must probe exactly like an index built
  * from scratch on the surviving vectors. Same fixed-seed discipline;
  * deterministic integer-derived vectors so probes have stable
  * neighborhoods across runs. */
@org.scalatest.tags.Slow
class AnnLifecycleFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vec(seed: Long): Seq[Float] =
    (0 until dim).map(i => (((seed * 31 + i * 7) % 13) - 6).toFloat)

  private val hyper = (0L until 8L).map(i => (i, vec(i + 100)))
    .toDF("h_id", "hv")

  private def probe(table: String): Seq[(Long, Int, Long)] =
    AnnIndex.probeTopK(spark, table,
        (0L until 3L).map(i => (i, vec(i + 500))).toDF("id", "vec"),
        "id", "vec", hyper, rowsPerBand = 4, k = 6, retracted = true)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("random ANN append/takedown/compact interleavings probe like " +
      "a from-scratch build on the surviving vectors (2 seeds)") {
    for (seed <- Seq(3L, 13L)) {
      val rnd = new Random(seed)
      val t = s"alf_idx_$seed"
      val ref = s"alf_ref_$seed"
      Compaction.dropManagedTable(spark, Tombstones.table(t))
      var nextId = 0L
      var corpus = Set.empty[Long]
      var live = Set.empty[Long]
      def newBatch(n: Int): Seq[Long] = {
        val ids = (0 until n).map { _ => val id = nextId; nextId += 1; id }
        corpus ++= ids; live ++= ids
        ids
      }
      def frame(ids: Seq[Long]) = ids.map(i => (i, vec(i))).toDF("id", "vec")
      AnnIndex.buildSignIndex(frame(newBatch(24)), "id", "vec", hyper,
        rowsPerBand = 4, table = t, overwrite = true)
      for (_ <- 1 to 6) rnd.nextInt(3) match {
        case 0 =>
          AnnIndex.appendBatch(frame(newBatch(4 + rnd.nextInt(8))),
            "id", "vec", hyper, rowsPerBand = 4, table = t)
        case 1 =>
          val ids = rnd.shuffle(corpus.toSeq)
            .take(1 + rnd.nextInt(5)) :+ 888888L
          AnnIndex.takedown(ids.toDF("id"), t)
          live --= ids
        case 2 =>
          AnnIndex.compactSignIndex(spark, t)
      }
      val lived = probe(t)
      AnnIndex.buildSignIndex(frame(live.toSeq.sorted), "id", "vec",
        hyper, rowsPerBand = 4, table = ref, overwrite = true)
      assert(lived === probe(ref),
        s"seed=$seed: lifecycle index diverged from rebuild " +
          s"(live=${live.size}/${corpus.size})")
      assert(!lived.exists(r => !live(r._3)),
        s"seed=$seed: a retracted vector answered")
      AnnIndex.compactSignIndex(spark, t)
      assert(probe(t) === lived,
        s"seed=$seed: final compaction moved a probe")
    }
  }
}
