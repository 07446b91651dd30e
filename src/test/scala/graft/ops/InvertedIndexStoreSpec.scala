package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the persisted-index contracts: structural posting merge
  * (build + append ≡ full rebuild, bit-identical assembly) and the
  * partition-pruned term lookup — the properties that make the stored
  * index an index rather than a cached query result. */
class InvertedIndexStoreSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  // lazy fixture: every test can run in isolation
  private lazy val store: String = {
    InvertedIndexStore.build(
      docs.filter(pmod(col("doc_id"), lit(3)) =!= 1),
      "doc_id", "text", "t_inv_incr", overwrite = true)
    InvertedIndexStore.append(
      docs.filter(pmod(col("doc_id"), lit(3)) === 1),
      "doc_id", "text", "t_inv_incr")
    "t_inv_incr"
  }

  test("append is the posting merge: incremental store assembles " +
      "bit-identical to a full rebuild") {
    val merged = InvertedIndexStore.assemble(spark, store)
      .orderBy("term").collect().toSeq
    val rebuilt = Retrieval.invertedIndex(docs, "doc_id", "text")
      .orderBy("term").collect().toSeq
    assert(merged.nonEmpty && merged == rebuilt)
  }

  test("term lookup reads only the term-prefix partitions") {
    val lk = InvertedIndexStore.lookup(spark, store,
      Seq("batch", "broadcast", "join"))
    val p = lk.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("p#"),
      s"prefix filter must prune partitions:\n$p")
    // correctness of the pruned read: df per term matches the assembly
    val byTerm = lk.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = InvertedIndexStore.assemble(spark, store)
      .filter(col("term").isin("batch", "broadcast", "join"))
      .select("term", "df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTerm == full && byTerm.nonEmpty)
  }

  test("BM25 from the store is bit-identical to payload scoring") {
    val fromStore = InvertedIndexStore.bm25FromStore(spark,
        store, Seq("batch", "join", "filter"), k = 10)
      .orderBy("rank").collect().toSeq
    val payload = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("batch", "join", "filter"), k = 10)
      .orderBy("rank").collect().toSeq
    assert(fromStore.nonEmpty && fromStore == payload)
  }

  test("the append-merged summary carries the exact corpus scalars") {
    val fromSummary = InvertedIndexStore.corpusScalars(spark, store)
      .collect().head
    val fromStats = spark.table(InvertedIndexStore.docsTable(store))
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L)))
      .collect().head
    assert(fromSummary.getLong(0) === fromStats.getLong(0))
    assert(fromSummary.getLong(1) === fromStats.getLong(1))
    // append-merged, not recomputed: one row per ingested batch
    assert(spark.table(InvertedIndexStore.summaryTable(store))
      .count() === 2)
  }

  test("the stored BM25 read touches nothing corpus-sized: summary " +
      "scalars, shard-pruned dl lookup (dynamic partition pruning)") {
    val q = InvertedIndexStore.bm25FromStore(spark, store,
      Seq("batch", "join", "filter"), k = 10)
    val plan = q.queryExecution.executedPlan.toString
    // the dl side must be the id-selective sharded lookup — the stats
    // scan carries a dynamic pruning filter on the shard column, not a
    // full-table pass (the r15 sf10 store-shape defect)
    assert(plan.contains("dynamicpruningexpression"),
      s"doc-stats scan must be shard-pruned:\n$plan")
    // corpus scalars come from the summary table, never a stats agg
    assert(plan.contains(InvertedIndexStore.summaryTable(store)),
      s"scalars must read the maintained summary:\n$plan")
  }
}
