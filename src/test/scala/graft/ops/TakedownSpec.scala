package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The takedown LSM contract over [[InvertedIndexStore]]: a tombstoned
  * store answers as-if-never-ingested, compaction folds tombstones into
  * the files WITHOUT moving any answer, and after compaction the
  * removed ids are genuinely gone from the data files (the property a
  * takedown audit checks). */
class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha join beta"), (2L, "join gamma join"),
    (3L, "alpha filter"), (4L, "filter join alpha"),
    (5L, "delta epsilon"), (6L, "join")).toDF("doc_id", "text")

  private def answers(table: String): Seq[(Int, Long, Long)] =
    InvertedIndexStore.bm25FromStoreRetracted(spark, table,
        Seq("join", "filter"), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

  test("tombstoned == compacted == rebuilt-without; files forget on " +
    "compaction; re-delivered tombstones are harmless") {
    val t = "td_spec_idx"
    val ref = "td_spec_ref"
    InvertedIndexStore.build(docs, "doc_id", "text", t, overwrite = true)
    Compaction.dropManagedTable(spark,
      InvertedIndexStore.tombstoneTable(t))
    InvertedIndexStore.takedown(Seq(2L, 4L).toDF("id"), t)
    // re-delivery of a takedown (at-least-once pipelines do this)
    InvertedIndexStore.takedown(Seq(4L).toDF("id"), t)
    val tombstoned = answers(t)

    // ground truth: a store built without the removed docs at all
    InvertedIndexStore.build(docs.filter(!col("doc_id").isin(2L, 4L)),
      "doc_id", "text", ref, overwrite = true)
    assert(tombstoned === answers(ref),
      "tombstoned store must answer as-if-never-ingested")
    assert(!tombstoned.exists(r => r._2 == 2L || r._2 == 4L))

    InvertedIndexStore.compactTombstones(spark, t)
    assert(answers(t) === tombstoned,
      "compaction must not move any answer")
    // the files genuinely no longer carry the removed ids
    assert(spark.table(t).filter(col("id").isin(2L, 4L)).count() === 0)
    assert(spark.table(InvertedIndexStore.docsTable(t))
      .filter(col("id").isin(2L, 4L)).count() === 0)
    // tombstone table is consumed by the fold
    assert(!spark.catalog.tableExists(
      InvertedIndexStore.tombstoneTable(t)))
    // a second compaction with nothing pending is a no-op, not a crash
    InvertedIndexStore.compactTombstones(spark, t)
    assert(answers(t) === tombstoned)
    // durable-staging hygiene (r9 advice): the swap's staging tables
    // are consumed by a completed compaction — none left behind
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.endsWith("__compact_staging")),
      "compaction must drop its staging tables")
  }

  test("the ANN index family honors the same contract: retracted " +
    "probe == compacted probe; bucket files forget") {
    import org.apache.spark.sql.functions._
    val dim = 8
    def vec(seed: Long): Seq[Float] =
      (0 until dim).map(i => (((seed * 31 + i * 7) % 13) - 6).toFloat)
    val emb = (0L until 40L).map(i => (i, vec(i))).toDF("id", "vec")
    val hyper = (0L until 8L).map(i => (i, vec(i + 100)))
      .toDF("h_id", "hv")
    val t = "td_spec_ann"
    AnnIndex.buildSignIndex(emb, "id", "vec", hyper, rowsPerBand = 4,
      table = t, overwrite = true)
    Compaction.dropManagedTable(spark, Tombstones.table(t))
    AnnIndex.takedown(Seq(6L, 7L, 21L).toDF("id"), t)
    def probe(): Seq[(Long, Int, Long)] =
      AnnIndex.probeTopK(spark, t,
          emb.filter(col("id") < 3), "id", "vec", hyper,
          rowsPerBand = 4, k = 5, retracted = true)
        .orderBy("q_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val retracted = probe()
    assert(!retracted.exists(r => Set(6L, 7L, 21L).contains(r._3)))
    AnnIndex.compactSignIndex(spark, t)
    assert(probe() === retracted, "compaction must not move the probe")
    assert(spark.table(t)
      .filter(col("id").isin(6L, 7L, 21L)).count() === 0)
    assert(!spark.catalog.tableExists(Tombstones.table(t)))
  }

  test("compact is re-runnable from a crash inside the phase-2 swap: " +
      "a dropped source with durable staging restores, then compacts") {
    val t = "td_spec_crash"
    Compaction.dropManagedTable(spark, t)
    Compaction.dropManagedTable(spark, s"${t}_data")
    // a previous FAILED run of this very test must not wedge the
    // suite on ErrorIfExists (r10 review)
    Compaction.dropManagedTable(spark, s"${t}_data__compact_staging")
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "payload")
      .write.format("parquet").saveAsTable(s"${t}_data")
    Compaction.dropManagedTable(spark, Tombstones.table(t))
    Tombstones.record(Seq(2L).toDF("id"), t)
    // simulate the crash window exactly: survivors (minus id=2) are
    // durable in staging, and saveAsTable has DROPPED the source but
    // not yet recreated it
    spark.table(s"${t}_data").filter(col("id") =!= 2L)
      .write.format("parquet").saveAsTable(s"${t}_data__compact_staging")
    Compaction.dropManagedTable(spark, s"${t}_data")
    // harsher still: the crashed CTAS died MID-WRITE, leaving partial
    // files at the target's location with no catalog entry — the
    // restore must clear them, not trip LOCATION_ALREADY_EXISTS
    val staleLoc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${t}_data")))
    val fs = staleLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(staleLoc)
    val out = fs.create(new org.apache.hadoop.fs.Path(staleLoc,
      "part-00000-dead.parquet"))
    out.write("not a real parquet footer".getBytes("UTF-8"))
    out.close()
    // the re-run must restore from staging, then complete the fold
    Tombstones.compact(spark, t, Seq((s"${t}_data", Seq.empty)))
    assert(spark.table(s"${t}_data").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 4L))
    assert(!spark.catalog.tableExists(s"${t}_data__compact_staging"))
    assert(!spark.catalog.tableExists(Tombstones.table(t)))
  }
}
