package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED inverted index — the stored counterpart of
  * [[Retrieval.invertedIndex]], in the (term, id) ROW form its
  * scaladoc prescribes for 100 TB posting lists (a hot term is a big
  * key group, not a giant value in one row), written partitioned by
  * the term's first character so a term lookup is a partition-pruned
  * scan (pinned in InvertedIndexStoreSpec).
  *
  * Incremental maintenance is STRUCTURAL here: the stored unit is the
  * (term, id) pair and batch doc ids are new by contract, so appending
  * the batch's posting rows IS the posting merge — no read-modify-
  * write of existing lists, no rebuild, and the append touches only
  * the prefix partitions the batch's terms hash into. The merged
  * index assembles to the exact same (term, df, postings) rows as a
  * full rebuild (gate q_incr_index_maintain shares
  * q_inverted_index's oracle). */
object InvertedIndexStore {

  /** Distinct (p, term, id) posting rows of a document batch;
    * p = first char of the term (the partition key). */
  def postingRows(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(Retrieval.toks(col(textCol))).as("term"))
      .dropDuplicates("term", "id")
      .select(substring(col("term"), 1, 1).as("p"), col("term"),
        col("id"))

  /** Write the corpus index (overwrite or keep-if-exists — same
    * catalog hygiene as [[graft.ops.AnnIndex.buildSignIndex]]). */
  def build(docs: DataFrame, idCol: String, textCol: String,
            table: String, overwrite: Boolean = false): Unit = {
    val s = docs.sparkSession
    if (overwrite || !s.catalog.tableExists(table)) {
      s.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      postingRows(docs, idCol, textCol)
        .write.partitionBy("p")
        .format("parquet").mode("overwrite").saveAsTable(table)
    }
  }

  /** Append a NEW batch's postings (batch doc ids must be new — the
    * standard ingest contract; dedup-vs-corpus is the exact-dedup
    * stage's job, upstream of indexing). */
  def append(batch: DataFrame, idCol: String, textCol: String,
             table: String): Unit =
    postingRows(batch, idCol, textCol)
      .write.partitionBy("p")
      .format("parquet").mode("append").saveAsTable(table)

  /** Assemble the stored rows to [[Retrieval.invertedIndex]]'s
    * (term, df, postings) verification shape. */
  def assemble(s: SparkSession, table: String): DataFrame =
    s.table(table)
      .groupBy("term")
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .select(col("term"), size(col("ids")).cast("long").as("df"),
        array_join(col("ids"), ",").as("postings"))

  /** Posting rows for a term set, read partition-pruned: the prefix
    * filter is derivable from the terms, so only |distinct first
    * chars| partitions are scanned. */
  def lookup(s: SparkSession, table: String,
             terms: Seq[String]): DataFrame = {
    val prefixes = terms.map(_.take(1)).distinct
    s.table(table)
      .filter(col("p").isin(prefixes: _*) &&
        col("term").isin(terms: _*))
      .select("term", "id")
  }
}
