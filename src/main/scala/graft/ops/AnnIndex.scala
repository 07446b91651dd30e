package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED sign-LSH ANN index — the difference between "ANN queries"
  * (rebuild the banding inside every query: [[Similarity.signLshBuckets]]
  * over the whole corpus per probe) and an "ANN-capable corpus store"
  * (build the banding ONCE, store it partitioned by its probe key,
  * answer every later query with a partition-pruned scan, and maintain
  * it incrementally as batches land).
  *
  * Layout: one row per (band, vector) carrying the vector id AND the
  * vector itself, written `partitionBy(band, bucket)` — the inverted-
  * list layout of IVF-family systems (the vector lives in the list, so
  * a probe re-ranks straight off the pruned partitions; no second
  * corpus-sized join to fetch payloads). Storage cost is `bands`×
  * vector replication, the standard trade for probe locality.
  *
  * Scale shape (100 TB corpus, KB probes):
  *  - BUILD: one pass over the corpus (crossJoin against the broadcast
  *    KB hyperplane set + one partial-aggregable groupBy), one
  *    partitioned write. Paid once.
  *  - PROBE: the query batch's buckets are a KB-sized frame; joining
  *    index ⋈ broadcast(queryBuckets) on the PARTITION COLUMNS lets
  *    dynamic partition pruning drop every non-probed (band, bucket)
  *    directory at runtime — the scan reads |probed buckets| ·
  *    (corpus/2^rowsPerBand)/bands rows, not the corpus
  *    (AnnIndexSpec pins the `dynamicpruning` filter in the plan).
  *  - MAINTAIN: a new batch is banded ALONE (batch-sized work, the
  *    [[Similarity.nearDupPairsAgainstBuckets]] discipline) and
  *    appended; partitioned appends only touch the partitions the
  *    batch lands in. No rebuild.
  *
  * Determinism: banding is a per-row projection of (vector,
  * hyperplanes), so build ∪ append ≡ one-shot build over the union —
  * the incremental path is bit-identical to the rebuild, which is what
  * lets q_ann_lsh_persisted share q_ann_lsh_topk's oracle. */
object AnnIndex {

  /** Band the corpus and write it as a managed parquet table
    * partitioned by (band, bucket). `overwrite = false` keeps an
    * existing table (idempotent re-entry in a warm session). */
  def buildSignIndex(corpus: DataFrame, idCol: String, vecCol: String,
                     hyper: DataFrame, rowsPerBand: Int, table: String,
                     overwrite: Boolean = false): Unit = {
    val s = corpus.sparkSession
    if (overwrite || !s.catalog.tableExists(table)) {
      s.sql(s"DROP TABLE IF EXISTS `$table`")
      // the session catalog is in-memory: a previous SESSION may have
      // left the managed location on disk with no catalog entry (same
      // hazard Bucketing.writeBucketed documents) — clear it
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      bucketRows(corpus, idCol, vecCol, hyper, rowsPerBand)
        .write.partitionBy("band", "bucket")
        .format("parquet").mode("overwrite").saveAsTable(table)
    }
  }

  /** Band ONLY the new batch and append it — incremental maintenance;
    * touches just the partitions the batch hashes into. */
  def appendBatch(batch: DataFrame, idCol: String, vecCol: String,
                  hyper: DataFrame, rowsPerBand: Int,
                  table: String): Unit =
    bucketRows(batch, idCol, vecCol, hyper, rowsPerBand)
      .write.partitionBy("band", "bucket")
      .format("parquet").mode("append").saveAsTable(table)

  /** (id, vec, band, bucket) banding rows: [[Similarity.signLshBuckets]]
    * buckets re-joined with the vector payload so the stored list is
    * self-contained. The rejoin is id-keyed and batch-sized. */
  private def bucketRows(df: DataFrame, idCol: String, vecCol: String,
                         hyper: DataFrame, rowsPerBand: Int): DataFrame =
    Similarity.signLshBuckets(df, idCol, vecCol, hyper, rowsPerBand)
      .join(df.select(col(idCol), col(vecCol).as("vec")), idCol)
      .select(col(idCol).as("id"), col("vec"), col("band"), col("bucket"))

  /** Top-k exact-cosine neighbors for each query vector, answered FROM
    * THE STORED INDEX: the queries are banded (KB-side work), the index
    * scan is joined on the partition columns (broadcast → dynamic
    * partition pruning), candidates dedup across bands, and exact
    * cosine ranks the union. Output (q_id, rank, id, cos_milli),
    * rank ties to the smaller id. */
  def probeTopK(s: SparkSession, table: String, queries: DataFrame,
                idCol: String, vecCol: String, hyper: DataFrame,
                rowsPerBand: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val qb = Similarity.signLshBuckets(
        queries, idCol, vecCol, hyper, rowsPerBand)
      .select(col(idCol).as("q_id"), col("band"), col("bucket"))
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val idx = s.table(table)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("cos_milli").desc, col("id").asc)
    idx.join(broadcast(qb), Seq("band", "bucket"))
      .filter(col("id") =!= col("q_id"))
      // a (q_id, id) pair can collide in several bands; the vector
      // payload is identical on every copy, so any survivor is the row
      .dropDuplicates("q_id", "id")
      .join(broadcast(qv), "q_id")
      .withColumn("cos_milli",
        graft.functions.GraftFunctions.cosineMilli(col("qv"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "id", "cos_milli")
  }
}
