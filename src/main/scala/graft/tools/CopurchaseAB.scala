package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the two co-purchase formulations (order-key
  * self-join vs per-basket local pair expansion) — same session,
  * alternating runs, so host drift hits both arms equally. */
object CopurchaseAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")

    def selfJoin(): DataFrame =
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("p1"), col("p2")).limit(100)

    def basket(): DataFrame =
      li.groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(filter(slice(ps, i + 2, size(ps)), " +
            "y -> y > x), y -> struct(x AS p1, y AS p2))))")).as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("p1"), col("p2")).limit(100)

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up both
    time(selfJoin); time(basket)
    val (js, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (_ <- 1 to 5) { js += time(selfJoin); bs += time(basket) }
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    println(f"selfJoin median ${med(js.result())}%.2f s  " +
      f"basket median ${med(bs.result())}%.2f s")
    spark.stop()
  }
}
