package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stack-sampling profiler for slow queries (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qname = args.lift(1).getOrElse("q_neardup_minhash_lsh")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val counts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        Thread.sleep(50)
        Thread.getAllStackTraces.forEach { (t, st) =>
          if (t.getName.startsWith("Executor task launch")) {
            st.take(40).find(f =>
              f.getClassName.startsWith("org.apache.spark.sql.catalyst.expressions") ||
              f.getClassName.contains("codegen") ||
              f.getClassName.contains("unsafe")
            ).foreach { f =>
              val key = s"${f.getClassName}.${f.getMethodName}"
              counts.merge(key, 1, _ + _)
            }
          }
        }
      }
    })
    sampler.setDaemon(true); sampler.start()

    val t0 = System.nanoTime()
    // count() lets Catalyst PRUNE the projections most queries exist to
    // measure — "noop" materializes every column like the bench does
    val n = if (args.lift(2).contains("noop")) {
      SparkEntry.queries(qname)(spark, d)
        .write.format("noop").mode("overwrite").save(); -1L
    } else SparkEntry.queries(qname)(spark, d).count()
    println(f"[prof] $qname rows=$n took ${(System.nanoTime()-t0)/1e9}%.1f s")
    sampling = false
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
      println(f"[prof] $v%6d  $k")
    }
    spark.stop()
  }
}
