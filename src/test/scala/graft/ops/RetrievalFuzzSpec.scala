package graft.ops

import scala.util.Random

import graft.SparkSpec

/** [[Retrieval.bm25TopK]] vs a straight-line replay of the documented
  * rational-BM25 pipeline (tokenize → tf/df/dl/corpus scalars → the
  * fixed-order double formula → integer sum → (score desc, id asc)
  * top-k) on seeded random corpora. The per-term milli expression is
  * deliberately restated with the SAME IEEE op order (that order is
  * the contract); what the fuzz independently exercises is everything
  * around it — the tf/df/dl/N/avgdl plumbing through four joins,
  * tokenless docs counted in N, docs sharing no query term excluded,
  * and the bounded-heap tie ordering. */
@org.scalatest.tags.Slow
class RetrievalFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Array("join", "filter", "scan", "merge", "sort",
    "index", "probe", "shard", "spill", "fuse", "x1", "x2")

  private def refTopK(docs: Seq[(Long, String)], terms: Seq[String],
                      k: Int): Seq[(Int, Long, Long)] = {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").toSeq.filter(_.nonEmpty)
    val tokd = docs.map { case (id, t) => id -> toks(t) }
    val nDocs = docs.size.toLong
    val totalTokens = tokd.map(_._2.size.toLong).sum
    val avgdl = totalTokens.toDouble / nDocs.toDouble
    val df = terms.map(q =>
      q -> tokd.count(_._2.contains(q)).toLong).toMap
    val scored = tokd.flatMap { case (id, ts) =>
      val dl = ts.size.toLong
      val s = terms.flatMap { q =>
        val tf = ts.count(_ == q).toLong
        if (tf == 0) None
        else {
          val idf = ((nDocs - df(q)).toDouble + 0.5d) /
            (df(q).toDouble + 0.5d)
          val tnorm = (tf.toDouble * 2.2d) /
            (tf.toDouble + 1.2d * (0.25d + 0.75d * (dl.toDouble / avgdl)))
          Some(math.floor(1000.0d * (idf * tnorm) + 0.5d).toLong)
        }
      }
      if (s.isEmpty) None else Some(id -> s.sum)
    }
    scored.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, s), i) => (i + 1, id, s) }
  }

  test("bm25TopK == straight-line replay on seeded random corpora " +
      "(tokenless docs, absent terms, tie ranks)") {
    for (seed <- Seq(6L, 21L, 35L)) {
      val rnd = new Random(seed)
      val docs = (0L until 80L).map { id =>
        // some empty and whitespace-only docs: they must still count
        // in N (and never score)
        val text =
          if (rnd.nextInt(10) == 0) (if (rnd.nextBoolean()) "" else "  \t ")
          else (0 until 1 + rnd.nextInt(12))
            .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
        (id, text)
      }
      val terms = Seq("join", "spill", "absentterm")
      val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
          "doc_id", "text", terms, k = 15)
        .orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === refTopK(docs, terms, 15),
        s"seed=$seed: BM25 ranking diverged")
    }
  }
}
