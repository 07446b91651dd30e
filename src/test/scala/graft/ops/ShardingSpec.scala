package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HRW sharding properties on seeded random keys: assignment
  * determinism and the minimal-disruption guarantee for EVERY possible
  * single-shard removal (the gate pins one removal; this sweeps all). */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val keys = {
    val rnd = new scala.util.Random(77L)
    (0 until 400).map(_ => rnd.nextLong().abs % 1000000L).distinct
  }

  test("removing any shard relocates exactly that shard's keys and " +
      "nothing else; survivors' assignments are untouched") {
    val full = Sharding.rendezvousShard(col("k"), 0 to 7)
    for (removed <- 0 to 7) {
      val partial = Sharding.rendezvousShard(col("k"),
        (0 to 7).filterNot(_ == removed))
      val rows = keys.toDF("k")
        .select(col("k"), full.as("s1"), partial.as("s2")).collect()
      rows.foreach { r =>
        val (s1, s2) = (r.getLong(1), r.getLong(2))
        if (s1 == removed) assert(s2 != removed.toLong)
        else assert(s2 == s1,
          s"key ${r.getLong(0)} moved $s1 -> $s2 though shard " +
            s"$removed was removed")
      }
    }
  }

  test("assignment spreads keys over every shard (no degenerate bias)") {
    val counts = keys.toDF("k")
      .select(Sharding.rendezvousShard(col("k"), 0 to 7).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L to 7L).toSet)
    assert(counts.values.min > keys.size / 32,
      s"degenerate spread: $counts")
  }
}
