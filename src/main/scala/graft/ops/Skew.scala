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

  /** Salted equi-join for a skewed FACT side, for when AQE's skew
    * splitting is unavailable (disabled, or the skew hides inside a
    * single in-flight partition AQE won't re-split): each fact row
    * takes a pseudo-random salt in [0, salts), the dim side is
    * replicated once per salt value, and the join key becomes
    * (keys..., salt) — a hot key's rows now land on `salts` reducers
    * instead of one. The dim-side cost is deliberate: `salts`× a
    * (small) dim beats one straggler reducer holding the hot key's
    * entire fact volume.
    *
    * Only inner/left joins: every fact row carries exactly one salt so
    * fact-side multiplicity is preserved; right/full-outer would emit
    * each UNMATCHED dim row once per salt replica — rejected. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int, how: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer")
        .contains(how.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left joins only, not '$how' " +
        "(dim replication would duplicate unmatched dim rows)")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, keys :+ "__salt", how).drop("__salt")
  }
}
