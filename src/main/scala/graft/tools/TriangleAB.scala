package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-attribution harness for q_triangle_count: times the edge
  * build, the orientation, and the full per-node count separately so
  * optimization effort lands on the stage that actually dominates.
  *
  * Run: `sbt "runMain graft.tools.TriangleAB [sfDir] [iters]"`. */
object TriangleAB {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pairExpansion: DataFrame = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), " +
          "y -> struct(x AS id_a, y AS id_b))))"))
        .as("pr"))

    def edges: DataFrame = pairExpansion
      .select(col("pr.id_a").as("id_a"), col("pr.id_b").as("id_b"))
      .distinct()

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val med = ts.map(_._1).sorted.apply(iters / 2)
      println(f"[tri-ab] $name%-28s median ${med}%7.2f s  n=${ts.head._2}")
    }

    time("edge_build")(edges.count())
    time("edge_build_nodistinct")(pairExpansion.count())
    time("full_per_node") {
      graft.ops.Triangles.perNode(edges).count()
    }
    spark.stop()
  }
}
