package graft.ops

import graft.SparkSpec

/** Hand-computed bigram coherence on a toy corpus, plus edge rows. */
class NgramSpec extends SparkSpec {

  test("scores match hand computation; short docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams ab, ba, ab
      (2L, "A  c"),    // lowercased, multi-space: bigram ac
      (3L, "solo"),    // 1 token -> excluded
      (4L, "")         // no tokens -> excluded
    ).toDF("doc_id", "text")
    val got = Ngram.bigramCoherence(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // c2: ab=2 ba=1 ac=1; c1: a=3 b=1
    // q(ab) = 2000000 div 3 = 666666; q(ba) = 1000000; q(ac) = 333333
    // doc1 = (666666 + 1000000 + 666666) div 3 = 777777
    assert(got.toSeq == Seq((1L, 3L, 777777L), (2L, 1L, 333333L)))
  }
}
