package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor (dev tool): prints the formatted physical plan of
  * selected queries so pushdown / broadcast / codegen properties can
  * be eyeballed and asserted. */
object Plans {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_join_chain", "q_agg_pricing", "q_agg_join_revenue",
        "q_dedup_agg")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, d)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
