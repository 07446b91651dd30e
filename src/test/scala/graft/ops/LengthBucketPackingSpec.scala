package graft.ops

import graft.SparkSpec

/** Length-bucketed packing: hand anchors plus a fuzz sweep against a
  * straight-line reference of the documented plan semantics. */
@org.scalatest.tags.Slow
class LengthBucketPackingSpec extends SparkSpec {
  import spark.implicits._

  private case class Row(id: Long, n: Long, bucket: Long, k: Long,
                         bin: Long, slot: Long, pad: Long, trunc: Long)

  private def reference(docs: Seq[(Long, Long)], cap: Long,
                        minB: Long): Seq[Row] = {
    val buckets = Iterator.iterate(minB)(_ * 2).takeWhile(_ <= cap).toSeq
    docs.filter(_._2 > 0)
      .map { case (id, n) =>
        val b = if (n > cap) 0L else buckets.find(n <= _).get
        (id, n, b)
      }
      .groupBy(_._3).toSeq.flatMap { case (b, ds) =>
        val k = if (b == 0) 1L else cap / b
        ds.sortBy(_._1).zipWithIndex.map { case ((id, n, _), seq) =>
          Row(id, n, b, k, seq / k, seq % k,
            if (b == 0) 0L else b - n,
            if (b == 0) n - cap else 0L)
        }
      }.sortBy(_.id)
  }

  private def run(docs: Seq[(Long, Long)], cap: Int,
                  minB: Int): Seq[Row] =
    Corpus.lengthBucketPacking(docs.toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", cap, minB)
      .orderBy("doc_id").collect().toSeq.map { r =>
        Row(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      }

  test("hand case: buckets, slots, overflow and zero-token drop") {
    // cap 64, min 16 -> buckets 16/32/64; k = 4/2/1
    val docs = Seq(1L -> 10L, 2L -> 16L, 3L -> 17L, 4L -> 30L,
      5L -> 64L, 6L -> 65L, 7L -> 12L, 8L -> 3L, 9L -> 0L)
    val got = run(docs, 64, 16)
    val want = Seq(
      Row(1, 10, 16, 4, 0, 0, 6, 0),
      Row(2, 16, 16, 4, 0, 1, 0, 0),
      Row(3, 17, 32, 2, 0, 0, 15, 0),
      Row(4, 30, 32, 2, 0, 1, 2, 0),
      Row(5, 64, 64, 1, 0, 0, 0, 0),
      Row(6, 65, 0, 1, 0, 0, 0, 1), // overflow: truncated by 1
      Row(7, 12, 16, 4, 0, 2, 4, 0),
      Row(8, 3, 16, 4, 0, 3, 13, 0)) // doc 9 dropped (0 tokens)
    assert(got == want)

    // a 5th 16-bucket doc starts bin 1
    val more = run(docs :+ (10L -> 9L), 64, 16)
    val d10 = more.find(_.id == 10).get
    assert(d10 == Row(10, 9, 16, 4, 1, 0, 7, 0))
  }

  test("stats: padding counts every wasted slot token") {
    // 16-bucket: docs 10,16,12,3,9 -> 5 docs, k=4, bins=2;
    // padding = 2*64 - (10+16+12+3+9) = 128 - 50 = 78
    val docs = Seq(1L -> 10L, 2L -> 16L, 7L -> 12L, 8L -> 3L,
      10L -> 9L, 6L -> 65L)
    val plan = Corpus.lengthBucketPacking(
      docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", 64, 16)
    val stats = Corpus.lengthBucketStats(plan, 64)
      .orderBy("bucket").collect()
    val byBucket = stats.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    // overflow: 1 doc, 1 bin, trunc 1, padding 64 - (65-1) = 0
    assert(byBucket(0L) == ((1L, 65L, 1L, 1L, 0L, 0L)))
    assert(byBucket(16L) == ((5L, 50L, 2L, 0L, 78L,
      1000L * 78 / 128)))
  }

  test("fuzz: 200 random corpora equal the reference at three shapes") {
    val rnd = new scala.util.Random(0xbac4e7L)
    for (round <- 0 until 200) {
      val nDocs = 1 + rnd.nextInt(30)
      val docs = (0 until nDocs).map { i =>
        (i.toLong, rnd.nextInt(300).toLong)
      }
      val (cap, minB) = Seq((512, 16), (128, 8), (64, 64))(round % 3)
      assert(run(docs, cap, minB) ==
        reference(docs, cap.toLong, minB.toLong),
        s"round $round cap=$cap minB=$minB docs=$docs")
    }
  }
}
