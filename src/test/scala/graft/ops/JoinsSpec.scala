package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq((1, "ang mo kio"), (2, "BEDOK"), (3, "nowhere"))
    .toDF("id", "town")
  private def dim = Seq(("Ang Mo Kio", 20), ("Bedok", 16))
    .toDF("town", "district")

  test("broadcastEnrich is a left join keeping unmatched fact rows") {
    val out = Joins.broadcastEnrich(
      fact.withColumn("town", lower(col("town"))),
      dim.withColumn("town", lower(col("town"))), Seq("town"))
    assert(out.count() == 3)
    assert(out.filter(col("district").isNull).count() == 1)
  }

  test("broadcastEnrich plan is a broadcast hash join") {
    val out = Joins.broadcastEnrich(
      fact.withColumn("town", lower(col("town"))),
      dim.withColumn("town", lower(col("town"))), Seq("town"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("normalizedEnrich joins case-insensitively and restores case") {
    val out = Joins.normalizedEnrich(fact, dim, "town", initcap)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("town") == "Ang Mo Kio")
    assert(out(0).getAs[Int]("district") == 20)
    assert(out(1).getAs[Int]("district") == 16)
    assert(out(2).isNullAt(out(2).fieldIndex("district")))
  }

  test("distinctDimEnrich dedups dim before join (no fanout)") {
    val dupDim = dim.union(dim) // duplicated dim rows would fan out
    val out = Joins.distinctDimEnrich(
      fact.withColumn("town", lower(col("town"))),
      dupDim.withColumn("town", lower(col("town"))),
      Seq("town", "district"), "town")
    assert(out.count() == 3)
  }

  test("enrichOverwrite overwrites colliding fact columns from dim") {
    val f = fact.withColumn("district", lit(-1))
    val d = dim.withColumn("town", lower(col("town")))
    val out = Joins.enrichOverwrite(
      f.withColumn("town", lower(col("town"))), d, "town", Seq("district"))
      .orderBy("id").collect()
    assert(out(0).getAs[Int]("district") == 20)
    assert(out(1).getAs[Int]("district") == 16)
    assert(out(2).isNullAt(out(2).fieldIndex("district"))) // unmatched → null
  }
}
