package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is row-identical to the plain join") {
    // heavy skew: 80% of fact rows share key 1
    val fact = spark.range(2000)
      .selectExpr("if(id % 5 = 0, id % 7, 1) AS k", "id AS v")
    val dim = Seq((0L, "z"), (1L, "hot"), (2L, "a"), (6L, "b"))
      .toDF("k", "name")
    val got = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
      .sort("k", "v").collect().toSeq
    val expected = fact.join(dim, Seq("k"))
      .sort("k", "v").collect().toSeq
    assert(got == expected && got.nonEmpty)
    // left join keeps unmatched fact rows exactly once
    val gotLeft = Skew.saltedJoin(fact, dim, Seq("k"), 8, "left").count()
    assert(gotLeft == fact.count())
  }

  test("saltedJoin rejects join types that would duplicate dim rows") {
    val f = spark.range(10).selectExpr("id AS k")
    val d = spark.range(10).selectExpr("id AS k")
    for (how <- Seq("right", "full", "full_outer", "left_anti")) {
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(f, d, Seq("k"), 4, how)
      }
    }
  }

  test("saltedSum matches the direct aggregation") {
    val df = spark.range(1000)
      .selectExpr("id % 3 AS g", "id AS x")
    val got = Skew.saltedSum(df, Seq("g"), "x", salts = 6)
      .sort("g").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = df.groupBy("g")
      .agg(sum("x").as("x_sum"), count(lit(1)).as("cnt"))
      .sort("g").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
  }
}
