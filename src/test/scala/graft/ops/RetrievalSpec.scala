package graft.ops

import graft.SparkSpec

/** Retrieval ops: hand-computed rational-BM25 scores and inverted-index
  * postings on a three-document corpus. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a"),
    (2L, "a c"),
    (3L, "c c c c")).toDF("doc_id", "text")

  test("bm25TopK matches the hand-computed rational scores") {
    // N=3, total=9, avgdl=3; query 'a': df=2
    //   doc1 tf=2 dl=3 → 825 milli; doc2 tf=1 dl=2 → 695 milli
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("a"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 1L, 825L), (2, 2L, 695L)))
  }

  test("multi-term scores sum per doc; ties break to smaller id") {
    // query {a, c}: doc2 has both terms, docs 1/3 one each
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("a", "c"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.length == 3)
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L))
  }

  test("invertedIndex: df and sorted comma-joined postings") {
    val out = Retrieval.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out == Map(
      "a" -> (2L, "1,2"),
      "b" -> (1L, "1"),
      "c" -> (2L, "2,3")))
  }

  test("tokenless and empty docs neither score nor index") {
    val withEmpty = docs.union(Seq((4L, "   ")).toDF("doc_id", "text"))
    val idx = Retrieval.invertedIndex(withEmpty, "doc_id", "text")
    assert(idx.count() == 3)
    // N includes the empty doc (4 docs), shifting idf but not presence
    val out = Retrieval.bm25TopK(withEmpty, "doc_id", "text", Seq("a"), 10)
      .collect().map(_.getLong(1))
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("rrfFuse: presence in both lists dominates one good rank; " +
      "exact integer parts; list-count reported") {
    import spark.implicits._
    // parts at c=60: rank1 → 16393, rank2 → 16129, rank3 → 15873
    val r1 = Seq((1, 10L), (2, 20L), (3, 30L)).toDF("rank", "id")
    val r2 = Seq((1, 20L), (2, 40L)).toDF("rank", "id")
    val out = Retrieval.rrfFuse(Seq(r1, r2), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // doc 20 (rank2 + rank1 = 32522) beats doc 10's solo rank1
    assert(out == Seq((1, 20L, 32522L, 2L), (2, 10L, 16393L, 1L),
      (3, 40L, 16129L, 1L), (4, 30L, 15873L, 1L)))
  }
}
