package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("keeps k best with deterministic ties, merges partials") {
    val df = Seq(
      ("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 7.0, 3L), ("a", 1.0, 4L),
      ("b", 2.0, 9L)
    ).toDF("g", "v", "id").repartition(4) // force partial merges
    val top2 = TopKAggregator.topK(2)
    val out = df.groupBy("g").agg(top2(col("v"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col._1").as("v"),
        col("col._2").as("id"))
      .orderBy("g", "pos").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 0, 7.0, 3L), ("a", 1, 5.0, 1L), // tie 5.0 → lower id wins
      ("b", 0, 2.0, 9L)))
  }
}
