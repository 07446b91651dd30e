package graft.plans

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class DedupWindowToAggregateSpec extends SparkSpec {

  private def session = {
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ DedupWindowToAggregate
    s
  }

  private def frame(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(
      ("k1", Option("a"), "s1"), ("k1", None, "s2"),
      ("k2", Option("b"), "s2"), ("k2", Option("b"), "s1"),
      ("k3", None, "s1")
    ).map { case (k, a, src) => (k, a.orNull, src) }
      .toDF("key", "a", "src")
  }

  test("rule rewrites window dedup into aggregate, same result") {
    val s = session
    val windowForm = Dedup.keepMostComplete(frame(s), Seq("key"),
      Seq("src", "a"))
    val optimized = windowForm.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Window ") &&
      !optimized.contains("WindowGroupLimit"),
      s"expected Window rewritten away:\n$optimized")
    assert(optimized.contains("min_by") || optimized.contains("Aggregate"),
      s"expected aggregate form:\n$optimized")
    // identical rows to the un-rewritten session
    val plain = Dedup.keepMostComplete(frame(spark), Seq("key"),
      Seq("src", "a")).orderBy("key").collect().toSeq
    assert(windowForm.orderBy("key").collect().toSeq == plain)
  }

  test("rule leaves descending-order windows alone") {
    val s = session
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("src").desc)
    val df = frame(s).withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(df.queryExecution.optimizedPlan.toString.contains("Window"))
    assert(df.count() == 3)
  }
}
