package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch plan inspector for the iterative-fit exchange question
  * (round-16 optimization): does the per-iteration den aggregate
  * re-shuffle the pair matrix, and do the two score-vector broadcast
  * builds reuse one exchange? */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pairs = spark.range(100000)
      .select((col("id") % 500).as("i"), (col("id") % 700).as("j"),
        lit(3L).as("n"), lit(1L).as("wi"))
      .localCheckpoint()
    val sym = pairs.select(col("i"), col("j"), col("n"))
      .unionByName(pairs.select(col("j").as("i"), col("i").as("j"),
        col("n")))
      .localCheckpoint()
    val sv = pairs.select(col("i").as("id")).distinct()
      .select(col("id"), lit(1000000L).as("s"))
      .localCheckpoint()
    println("===== variant A: as-is (sym unpartitioned) =====")
    val denA = sym
      .join(sv.select(col("id").as("i"), col("s").as("si")), Seq("i"))
      .join(sv.select(col("id").as("j"), col("s").as("sj")), Seq("j"))
      .select(col("i").as("id"),
        expr("n * 1000000000L div (si + sj)").as("term"))
      .groupBy("id").agg(sum(col("term")).as("den"))
    denA.explain("formatted")

    println("===== variant B: sym pre-partitioned by i =====")
    val symP = sym.repartition(col("i")).localCheckpoint()
    val denB = symP
      .join(sv.select(col("id").as("i"), col("s").as("si")), Seq("i"))
      .join(sv.select(col("id").as("j"), col("s").as("sj")), Seq("j"))
      .select(col("i").as("id"),
        expr("n * 1000000000L div (si + sj)").as("term"))
      .groupBy("id").agg(sum(col("term")).as("den"))
    denB.explain("formatted")
    denB.write.format("noop").mode("overwrite").save()
    println("===== B executed plan =====")
    println(denB.queryExecution.executedPlan.toString.take(4000))

    println("===== variant C: sym persisted after repartition =====")
    val symC = sym.repartition(col("i")).persist()
    symC.count()
    val denC = symC
      .join(sv.select(col("id").as("i"), col("s").as("si")), Seq("i"))
      .join(sv.select(col("id").as("j"), col("s").as("sj")), Seq("j"))
      .select(col("i").as("id"),
        expr("n * 1000000000L div (si + sj)").as("term"))
      .groupBy("id").agg(sum(col("term")).as("den"))
    denC.write.format("noop").mode("overwrite").save()
    println(denC.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
