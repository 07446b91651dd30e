package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for power-law keys. AQE handles skewed JOINS
  * automatically; skewed AGGREGATIONS on low-cardinality / hot keys
  * still serialize each group onto one reducer — salting splits a hot
  * group across `salts` reducers and recombines. Associative
  * aggregates only (sum/count/min/max). */
object Skew {

  /** Two-stage salted sum+count: groupBy (keys, salt) → partial
    * aggregate (shuffle spread over `salts`× more reducers) → groupBy
    * (keys) → combine. Result is identical to the direct groupBy —
    * integer/associative aggregation makes the regrouping exact. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(valueCol), monotonically_increasing_id()), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"${valueCol}_sum"),
        sum(col("__pcnt")).as("cnt"))
  }
}
