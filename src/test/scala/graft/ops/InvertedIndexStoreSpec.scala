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
}
