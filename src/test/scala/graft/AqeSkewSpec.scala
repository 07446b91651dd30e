package graft

import org.apache.spark.sql.functions._

/** Pins that AQE's skew-join mitigation actually FIRES under this
  * engine's configuration — the mechanism the no-hint fact joins
  * (Merge anti-joins, salted-join's alternative) rely on at scale.
  * Thresholds are scaled down so a local dataset exhibits "skew";
  * the assertion is on the executed (adaptive, final) plan. */
class AqeSkewSpec extends SparkSpec {

  test("AQE marks and splits the skewed partition of a shuffle join") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    import s2.implicits._
    // 100k rows on ONE key + a sprinkle of others: one reducer gets
    // ~25x the bytes of its peers
    val skewed = s2.range(110000)
      .select(when(col("id") < 100000, 0L).otherwise(col("id") % 37)
        .as("k"), col("id").as("v"))
    val dim = (0L until 37L).map(k => (k, s"d$k")).toDF("k", "name")
    val joined = skewed.join(dim, "k")
    // execute THIS QueryExecution (count() would plan a separate one
    // and leave this plan un-finalized at isFinalPlan=false)
    assert(joined.collect().length == 110000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected AQE to mark the skewed join:\n$finalPlan")
  }
}
