package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Seeded randomized properties for this batch's operators: each
  * distributed formulation must equal an independent brute-force
  * definition on inputs it did not see during development. Fixed
  * seeds — failures reproduce. */
@org.scalatest.tags.Slow
class GraphRetrievalPropertySpec extends SparkSpec {
  import spark.implicits._

  // ---- triangles: orientation+intersect == naive enumeration --------

  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (a, b) => a != b }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val tris = for {
      u <- nodes; v <- nodes if v > u && adj(u)(v)
      w <- nodes if w > v && adj(u)(w) && adj(v)(w)
    } yield Seq(u, v, w)
    tris.flatten.groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
  }

  test("triangle counts equal brute force on random graphs (3 seeds)") {
    for (seed <- Seq(11L, 42L, 99L)) {
      val rnd = new Random(seed)
      val n = 24
      // dense enough for many triangles, plus duplicate/reversed noise
      val edges = (1 to 120).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val got = Triangles.perNode(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteTriangles(edges), s"seed=$seed")
    }
  }

  // ---- delta-join MV: expansion == full recompute --------------------

  test("delta-join expansion equals full recompute on random splits " +
      "(3 seeds)") {
    for (seed <- Seq(7L, 21L, 63L)) {
      val rnd = new Random(seed)
      def rows(tag: String) = (1 to 60).map { i =>
        (rnd.nextInt(15).toLong, s"$tag$i")
      }
      val (a, bRows) = (rows("a"), rows("b"))
      val (aOld, dA) = a.partition(_ => rnd.nextBoolean())
      val (bOld, dB) = bRows.partition(_ => rnd.nextBoolean())
      val (aoDf, daDf) = (aOld.toDF("k", "pa"), dA.toDF("k", "pa"))
      val (boDf, dbDf) = (bOld.toDF("k", "pb"), dB.toDF("k", "pb"))
      val incr = IncrementalJoin.deltaJoinInserts(
          aoDf.join(boDf, Seq("k")), aoDf, daDf, boDf, dbDf, Seq("k"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toSeq
      val full = a.toDF("k", "pa").join(bRows.toDF("k", "pb"), Seq("k"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toSeq
      assert(incr == full, s"seed=$seed")
    }
  }

  // ---- BM25: distributed pipeline == direct per-doc computation -----

  test("bm25TopK equals a direct single-threaded computation (2 seeds)") {
    for (seed <- Seq(5L, 17L)) {
      val rnd = new Random(seed)
      val vocab = Vector("red", "blue", "green", "join", "scan", "agg")
      val docs = (1 to 40).map { i =>
        val len = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val terms = Seq("join", "red")
      val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
          "doc_id", "text", terms, k = 40)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toMap

      // independent reference implementation
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
      val nDocs = docs.size.toDouble
      val total = toks.values.map(_.size).sum.toDouble
      val avgdl = total / nDocs
      val dfm = terms.map(t =>
        t -> toks.count(_._2.contains(t)).toDouble).toMap
      val want = toks.flatMap { case (id, ts) =>
        val score = terms.map { t =>
          val tf = ts.count(_ == t).toDouble
          if (tf == 0) 0L
          else {
            val idf = ((nDocs - dfm(t)) + 0.5) / (dfm(t) + 0.5)
            val tn = (tf * 2.2) /
              (tf + 1.2 * (0.25 + 0.75 * (ts.size.toDouble / avgdl)))
            math.floor(1000.0 * (idf * tn) + 0.5).toLong
          }
        }.sum
        if (score > 0L) Some(id -> score) else None
      }
      assert(got == want, s"seed=$seed")
    }
  }
}
