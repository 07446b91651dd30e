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

  test("the banded phash index honors the takedown contract through " +
      "its band-partitioned layout: retracted probe == rebuilt-without; " +
      "compaction moves nothing and the files forget") {
    import org.apache.spark.sql.DataFrame
    val t = "td_spec_phash"
    val ref = "td_spec_phash_ref"
    Seq(t, ref, s"${t}__compact_staging").foreach(
      Compaction.dropManagedTable(spark, _))
    Compaction.dropManagedTable(spark, Tombstones.table(t))
    // deterministic 60-bit fingerprints; the probe batch re-keys the
    // first six, so every hit is an exact (hamming 0) twin
    val hashes = (0L until 30L)
      .map(i => (i, (i * 0x9E3779B97FL) & ((1L << 60) - 1)))
      .toDF("doc_id", "phash")
    Multimodal.bandedPhash(hashes)
      .write.format("parquet").partitionBy("band").saveAsTable(t)
    Multimodal.phashTakedown(Seq(2L, 4L).toDF("id"), t)
    val batch = hashes.filter(col("doc_id") < 6)
      .select((col("doc_id") + 100L).as("doc_id"), col("phash"))
    def probe(idx: DataFrame): Seq[(Long, Long, Long)] =
      Multimodal.phashNearDupAgainst(batch, idx)
        .orderBy("id_new", "id_corpus").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val retracted = probe(Multimodal.phashIndexRetracted(spark, t))
    assert(retracted.nonEmpty)
    assert(!retracted.exists(r => r._2 == 2L || r._2 == 4L))
    Multimodal.bandedPhash(hashes.filter(!col("doc_id").isin(2L, 4L)))
      .write.format("parquet").partitionBy("band").saveAsTable(ref)
    assert(retracted === probe(spark.table(ref)),
      "tombstoned index must answer as-if-never-ingested")
    Multimodal.compactPhashIndex(spark, t)
    assert(probe(Multimodal.phashIndexRetracted(spark, t)) === retracted,
      "compaction must not move the probe")
    assert(spark.table(t).schema === spark.table(ref).schema,
      "the partitioned layout must survive the two-phase swap")
    assert(spark.table(t).filter(col("doc_id").isin(2L, 4L)).count() === 0)
    assert(!spark.catalog.tableExists(Tombstones.table(t)))
    Seq(t, ref).foreach(Compaction.dropManagedTable(spark, _))
  }

  test("a PARTITIONED source crash-restores with its exact schema: " +
      "numeric-looking string prefixes and long bucket columns survive") {
    // The r10 advice scenario: AnnIndex partitions by long band/bucket,
    // InvertedIndexStore by a string prefix — directory-name type
    // inference on the restore read would turn prefix "00" into the
    // number 0 (colliding with "0") and longs into ints. The staging
    // copy is written unpartitioned precisely so the footers keep the
    // truth; this pins it through a simulated phase-2 crash.
    val t = "td_spec_crash_part"
    val data = s"${t}_data"
    Compaction.dropManagedTable(spark, t)
    Compaction.dropManagedTable(spark, data)
    Compaction.dropManagedTable(spark, s"${data}__compact_staging")
    Compaction.dropManagedTable(spark, Tombstones.table(t))
    Seq((1L, "00", 7L, "a"), (2L, "0", 7L, "b"),
        (3L, "00", 8L, "c"), (4L, "01", 9L, "d"))
      .toDF("id", "p", "bucket", "payload")
      .write.format("parquet").partitionBy("p", "bucket").saveAsTable(data)
    val wantSchema = spark.table(data).schema
    Tombstones.record(Seq(3L).toDF("id"), t)
    // crash window: survivors durable in (unpartitioned) staging, the
    // source dropped mid-swap
    spark.table(data).filter(col("id") =!= 3L)
      .write.format("parquet").saveAsTable(s"${data}__compact_staging")
    Compaction.dropManagedTable(spark, data)
    Tombstones.compact(spark, t, Seq((data, Seq("p", "bucket"))))
    val restored = spark.table(data)
    assert(restored.schema("p").dataType ===
      org.apache.spark.sql.types.StringType,
      "string partition column must not be re-inferred as numeric")
    assert(restored.schema("bucket").dataType ===
      org.apache.spark.sql.types.LongType,
      "long partition column must stay long")
    assert(restored.schema === wantSchema)
    assert(restored.select("id", "p").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
      Seq((1L, "00"), (2L, "0"), (4L, "01")),
      "prefix \"00\" must survive as the string \"00\", distinct from \"0\"")
    assert(!spark.catalog.tableExists(s"${data}__compact_staging"))
    assert(!spark.catalog.tableExists(Tombstones.table(t)))
  }

  test("recordAll: ONE removal set propagates to every store family " +
      "in one pass — each retracted face forgets, re-delivery of the " +
      "whole sweep is harmless") {
    import org.apache.spark.sql.functions._
    val invT = "td_xspec_inv"
    val annT = "td_xspec_ann"
    Seq(invT, InvertedIndexStore.docsTable(invT), annT,
        Tombstones.table(invT), Tombstones.table(annT))
      .foreach(Compaction.dropManagedTable(spark, _))
    InvertedIndexStore.build(docs, "doc_id", "text", invT,
      overwrite = true)
    val dim = 8
    def vec(seed: Long): Seq[Float] =
      (0 until dim).map(i => (((seed * 31 + i * 7) % 13) - 6).toFloat)
    val emb = (1L to 6L).map(i => (i, vec(i))).toDF("id", "vec")
    val hyper = (0L until 8L).map(i => (i, vec(i + 100)))
      .toDF("h_id", "hv")
    AnnIndex.buildSignIndex(emb, "id", "vec", hyper, rowsPerBand = 4,
      table = annT, overwrite = true)
    // the DMCA shape: one id set, every store, one pass
    val removal = Seq(2L, 4L).toDF("id")
    Tombstones.recordAll(removal, Seq(invT, annT))
    // and re-delivered wholesale (at-least-once pipelines do this)
    Tombstones.recordAll(removal, Seq(invT, annT))
    def servedIds(store: String, raw: org.apache.spark.sql.DataFrame)
        : Set[Long] =
      Tombstones.minus(spark, store, raw.select("id"))
        .distinct().collect().map(_.getLong(0)).toSet
    assert(servedIds(invT, spark.table(invT)) === Set(1L, 3L, 5L, 6L),
      "inverted postings face must serve exactly the survivors")
    assert(servedIds(invT,
        spark.table(InvertedIndexStore.docsTable(invT))) ===
      Set(1L, 3L, 5L, 6L),
      "doc-stats face must serve exactly the survivors")
    assert(servedIds(annT, spark.table(annT)) === Set(1L, 3L, 5L, 6L),
      "ANN bucket face must serve exactly the survivors")
    Seq(invT, InvertedIndexStore.docsTable(invT), annT,
        Tombstones.table(invT), Tombstones.table(annT))
      .foreach(Compaction.dropManagedTable(spark, _))
  }

  test("an unrecoverable compaction state (source gone, staging " +
      "partial or absent) fails with a descriptive error, not an " +
      "opaque TABLE_OR_VIEW_NOT_FOUND") {
    val t = "td_spec_wedged"
    val data = s"${t}_data"
    Compaction.dropManagedTable(spark, data)
    Compaction.dropManagedTable(spark, s"${data}__compact_staging")
    Compaction.dropManagedTable(spark, Tombstones.table(t))
    Tombstones.record(Seq(1L).toDF("id"), t)
    // staging absent entirely
    val e1 = intercept[IllegalStateException] {
      Tombstones.compact(spark, t, Seq((data, Seq.empty)))
    }
    assert(e1.getMessage.contains("unrecoverable compaction state"))
    assert(e1.getMessage.contains(data))
    assert(e1.getMessage.contains("absent"))
    // staging PARTIAL (files but no _SUCCESS): must refuse to restore a
    // possibly-incomplete survivor set over nothing
    val tmpLoc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(
          s"${data}__compact_staging")))
    val fs = tmpLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(tmpLoc)
    val out = fs.create(new org.apache.hadoop.fs.Path(tmpLoc,
      "part-00000-partial.parquet"))
    out.write("torn write".getBytes("UTF-8")); out.close()
    val e2 = intercept[IllegalStateException] {
      Tombstones.compact(spark, t, Seq((data, Seq.empty)))
    }
    assert(e2.getMessage.contains("no _SUCCESS"))
    fs.delete(tmpLoc, true)
    Compaction.dropManagedTable(spark, Tombstones.table(t))
  }
}
