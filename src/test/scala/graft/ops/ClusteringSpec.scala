package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Integer-exact k-means: hand-checkable geometry, determinism of the
  * tie/empty-cluster rules, and the no-shuffle assignment plan pin. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two tight groups on a line: ids 0,1 seed the codebook
  private val pts: Seq[(Long, Seq[Long])] = Seq(
    0L -> Seq(0L, 0L),      // seed c0
    1L -> Seq(100L, 0L),    // seed c1
    2L -> Seq(2L, 0L),
    3L -> Seq(4L, 0L),
    4L -> Seq(98L, 0L),
    5L -> Seq(96L, 0L))

  private def runKmeans(data: Seq[(Long, Seq[Long])], k: Int, iters: Int) =
    Clustering.kmeansAssign(data.toDF("id", "qv"), "id", "qv", k, iters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

  test("two tight groups split to their seeds; dist_sq is exact") {
    val out = runKmeans(pts, k = 2, iters = 2)
    assert(out.map(t => t._1 -> t._2).toMap == Map(
      0L -> 0L, 2L -> 0L, 3L -> 0L, 1L -> 1L, 4L -> 1L, 5L -> 1L))
    // final centroids: c0 = mean(0,2,4) = 2 exactly; c1 = mean(100,98,96) = 98
    val dist = out.map(t => t._1 -> t._3).toMap
    assert(dist(0L) == 4L)   // (0-2)^2
    assert(dist(2L) == 0L)   // (2-2)^2
    assert(dist(1L) == 4L)   // (100-98)^2
  }

  test("floor-division mean is exact for negative sums too") {
    // one cluster, members -1 and -2: sum -3, n 2, floor(-1.5) = -2
    val data = Seq(0L -> Seq(-1L), 1L -> Seq(-1000L), 2L -> Seq(-2L))
    // k=2: seeds 0:(-1), 1:(-1000); member 2 joins cluster 0
    val out = runKmeans(data, k = 2, iters = 1)
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(byId(2L) == 0L)
    // centroid 0 after update = floor((-1 + -2)/2) = -2 → dist(0) = 1
    assert(out.find(_._1 == 0L).get._3 == 1L)
  }

  test("equidistant point ties to the smaller centroid id") {
    // seeds 0:(0), 1:(10); point at 5 is equidistant → cluster 0.
    // one iteration: c0 = floor((0+5)/2) = 2, c1 = 10
    val data = Seq(0L -> Seq(0L), 1L -> Seq(10L), 2L -> Seq(5L))
    val out = runKmeans(data, k = 2, iters = 1)
    assert(out.find(_._1 == 2L).get._2 == 0L)
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // duplicate seed vectors: id 1 ties to c0 (smaller cid wins), so
    // cluster 1 is empty after iteration 1 and must CARRY its previous
    // centroid (0) instead of vanishing.
    //   iter1: all → c0 (2:(5) is equidistant 25/25 → tie → c0);
    //          update c0 = floor((0+0+5)/3) = 1, c1 = (0) carried
    //   iter2: 0,1 → c1 (d 0 < 1); 2 → c0 (16 < 25);
    //          update c0 = 5, c1 = 0
    //   final: 0 → (c1, 0), 1 → (c1, 0), 2 → (c0, 0)
    val data = Seq(0L -> Seq(0L), 1L -> Seq(0L), 2L -> Seq(5L))
    val out = runKmeans(data, k = 2, iters = 2)
    assert(out.toSeq == Seq((0L, 1L, 0L), (1L, 1L, 0L), (2L, 0L, 0L)))
  }

  test("assignment plan has no join and no exchange (literal codebook)") {
    val df = Clustering.kmeansAssign(
      pts.toDF("id", "qv"), "id", "qv", k = 2, iters = 1)
    val plan = df.queryExecution.executedPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(nodes)
    val all = nodes(plan)
    assert(!all.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"assignment must not shuffle:\n$plan")
    assert(!all.exists(p => p.isInstanceOf[SortMergeJoinExec] ||
      p.isInstanceOf[BroadcastHashJoinExec]),
      s"assignment must not join:\n$plan")
  }

  test("greedy k-center picks farthest-point-first with id tie-breaks") {
    // line: 0,2,4,98,100,96,50. seed = id 0 (pos 0); round 2 picks the
    // farthest point (pos 100 = id 4); round 3 the point maximizing
    // min-dist to {0,100} (pos 50 = id 6, dmin 2500).
    val data: Seq[(Long, Seq[Long])] = Seq(
      0L -> Seq(0L), 1L -> Seq(2L), 2L -> Seq(4L), 3L -> Seq(98L),
      4L -> Seq(100L), 5L -> Seq(96L), 6L -> Seq(50L))
    val out = Clustering.kCenterAssign(data.toDF("id", "qv"),
        "id", "qv", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 0L, 0L),        // center itself
      (1L, 0L, 4L),        // 2 → nearest center 0
      (2L, 0L, 16L),       // 4 → center 0 (dist 16 < 46² to 50)
      (3L, 4L, 4L),        // 98 → center at 100
      (4L, 4L, 0L),
      (5L, 4L, 16L),
      (6L, 6L, 0L)))       // 50 selected round 3
  }

  test("k-center maxmin tie goes to the smaller id") {
    // seed id 0 at 0; ids 1 and 2 both at distance 10 → round 2 must
    // select id 1; id 2 then ties between centers 0 and 1 (dist 100
    // both) → assigned to the smaller center id 0.
    val data: Seq[(Long, Seq[Long])] = Seq(
      0L -> Seq(0L), 1L -> Seq(10L), 2L -> Seq(-10L))
    val out = Clustering.kCenterAssign(data.toDF("id", "qv"),
        "id", "qv", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out == Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 100L)))
  }

  test("quantizeMilli rounds half-up on exact binary fractions") {
    val out = Seq((Seq(0.0015f, -0.001f, 0.25f)))
      .toDF("v")
      .select(Clustering.quantizeMilli(col("v")).as("q"))
      .collect()(0).getSeq[Long](0)
    // 0.0015f is not exactly representable; quantize via the same cast
    val expected = Seq(
      math.floor(0.0015f.toDouble * 1000d + 0.5d).toLong,
      math.floor(-0.001f.toDouble * 1000d + 0.5d).toLong,
      250L)
    assert(out == expected)
  }
}
