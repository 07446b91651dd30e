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

  /** (p, term, id, tf) posting rows of a document batch — one row per
    * present (term, doc) carrying the term frequency (the posting
    * payload real IR systems store); p = first char of the term (the
    * partition key). */
  def postingRows(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(Retrieval.toks(col(textCol))).as("term"))
      .groupBy("term", "id")
      .agg(count(lit(1)).as("tf"))
      .select(substring(col("term"), 1, 1).as("p"), col("term"),
        col("id"), col("tf"))
      // one file per prefix partition per write, not tasks×partitions
      // slivers (write-compacted discipline; Compaction handles the
      // accumulation across appends)
      .repartition(col("p"))

  /** (id, dl) per-document token counts — the OTHER sufficient
    * statistic BM25 needs; tokenless docs keep dl = 0 so corpus
    * scalars (N, total token mass) derive exactly. */
  def docStats(docs: DataFrame, idCol: String,
               textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      size(Retrieval.toks(col(textCol))).cast("long").as("dl"))

  /** The doc-stats side table name beside a postings table. */
  def docsTable(table: String): String = s"${table}_docs"

  private def dropManaged(s: SparkSession, table: String): Unit =
    Compaction.dropManagedTable(s, table)

  /** Write the corpus index: the prefix-partitioned postings table
    * plus the (id, dl) doc-stats side table (same catalog hygiene as
    * [[graft.ops.AnnIndex.buildSignIndex]]). */
  def build(docs: DataFrame, idCol: String, textCol: String,
            table: String, overwrite: Boolean = false): Unit = {
    val s = docs.sparkSession
    // BOTH tables must exist to skip: a run that died between the two
    // writes must rebuild, or bm25FromStore reads a half-built store
    if (overwrite || !s.catalog.tableExists(table) ||
        !s.catalog.tableExists(docsTable(table))) {
      dropManaged(s, table)
      dropManaged(s, docsTable(table))
      postingRows(docs, idCol, textCol)
        .write.partitionBy("p")
        .format("parquet").mode("overwrite").saveAsTable(table)
      docStats(docs, idCol, textCol)
        .write.format("parquet").mode("overwrite")
        .saveAsTable(docsTable(table))
    }
  }

  /** Append a NEW batch's postings and doc stats (batch doc ids must
    * be new — the standard ingest contract; dedup-vs-corpus is the
    * exact-dedup stage's job, upstream of indexing). */
  def append(batch: DataFrame, idCol: String, textCol: String,
             table: String): Unit = {
    postingRows(batch, idCol, textCol)
      .write.partitionBy("p")
      .format("parquet").mode("append").saveAsTable(table)
    docStats(batch, idCol, textCol)
      .write.format("parquet").mode("append")
      .saveAsTable(docsTable(table))
  }

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
      .select("term", "id", "tf")
  }

  /** Rational-BM25 top-k answered FROM THE STORE ONLY — no text is
    * touched: tf rides in the pruned posting lookup, df derives from
    * the looked-up postings (each list is complete for its term), dl
    * joins from the doc-stats table (id-selective — only docs holding
    * a query term), and the corpus scalars are one partial-aggregable
    * pass over the 2-column stats table. The score expression and the
    * final ranking are [[Retrieval.termScoreMilli]]/[[Retrieval.rankTopK]]
    * — the SAME objects the payload path uses, so the stored path is
    * bit-identical by construction (gate shares q_bm25_topk's oracle). */
  def bm25FromStore(s: SparkSession, table: String,
                    queryTerms: Seq[String], k: Int): DataFrame = {
    val post = lookup(s, table, queryTerms)
    val stats = s.table(docsTable(table))
    val scalars = stats.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))
    val df = post.groupBy("term").agg(count(lit(1)).as("df"))
    Retrieval.rankTopK(
      post.join(broadcast(df), "term")
        .join(stats, "id")
        .crossJoin(broadcast(scalars))
        .withColumn("term_score", Retrieval.termScoreMilli),
      k)
  }

  // ---- takedown: tombstones + compaction ------------------------------
  // The deletion path a 100 TB corpus cannot live without (takedown /
  // consent-revocation sweeps): a document's postings are spread across
  // every term-prefix partition it has a term in, so a physical delete
  // would rewrite most of the store for ONE id. LSM discipline instead:
  // a takedown appends the ids to a side TOMBSTONE table — O(|removal|)
  // rows, no store rewrite — and readers anti-join it; a later
  // compaction folds the tombstones into the data files and truncates
  // the side table. Query answers are identical in both states
  // (TakedownSpec pins tombstoned == compacted == rebuilt-without).

  /** The tombstone side table beside a postings table. */
  def tombstoneTable(table: String): String = Tombstones.table(table)

  /** Record `removeIds` (a 1-column id frame) as taken down — see
    * [[Tombstones.record]]. */
  def takedown(removeIds: DataFrame, table: String): Unit =
    Tombstones.record(removeIds, table)

  /** [[bm25FromStore]] with tombstones applied to BOTH sufficient
    * statistics — postings AND doc stats — so df, dl, and the corpus
    * scalars all derive from the retracted corpus: the answer is
    * as-if-never-ingested, not just filtered output rows. */
  def bm25FromStoreRetracted(s: SparkSession, table: String,
                             queryTerms: Seq[String], k: Int): DataFrame = {
    val post = Tombstones.minus(s, table, lookup(s, table, queryTerms))
    val stats = Tombstones.minus(s, table, s.table(docsTable(table)))
    val scalars = stats.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))
    val df = post.groupBy("term").agg(count(lit(1)).as("df"))
    Retrieval.rankTopK(
      post.join(broadcast(df), "term")
        .join(stats, "id")
        .crossJoin(broadcast(scalars))
        .withColumn("term_score", Retrieval.termScoreMilli),
      k)
  }

  /** Fold tombstones into the data files — postings (term-prefix
    * partitioned) and doc stats — then drop the side table; see
    * [[Tombstones.compact]]. */
  def compactTombstones(s: SparkSession, table: String): Unit =
    Tombstones.compact(s, table,
      Seq((table, Seq("p")), (docsTable(table), Seq.empty)))
}
