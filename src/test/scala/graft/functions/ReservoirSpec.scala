package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the bounded reservoir:
  *  - MERGE INVARIANCE: any partitioning of the input yields the
  *    identical sample (the property that makes it valid as a
  *    distributed / streaming partial aggregate);
  *  - equality with the window (sort) formulation;
  *  - INCLUSION FREQUENCY: across seeds, every stratum is sampled at
  *    ~k/n — the uniformity guarantee, checked like the Misra-Gries
  *    bound (over planted strata, not exact contents). */
class ReservoirSpec extends SparkSpec {
  import spark.implicits._

  private def sample(ids: Seq[Long], parts: Int, k: Int,
                     seed: String): Seq[Long] =
    graft.ops.Corpus.reservoirSample(
        ids.toDF("id").repartition(parts), strata = Seq.empty,
        idCol = "id", k = k, seed = seed)
      .orderBy("sample_rank").select("id").as[Long].collect().toSeq

  test("merge invariance: 1, 4, and 13 partitions yield the identical " +
      "sample") {
    val ids = (1L to 500L)
    val a = sample(ids, 1, 25, "s1")
    val b = sample(ids, 4, 25, "s1")
    val c = sample(ids, 13, 25, "s1")
    assert(a.size == 25 && a == b && b == c)
  }

  test("aggregate form equals the window formulation") {
    val df = (1L to 300L).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en")
        .otherwise("de"))
    val agg = graft.ops.Corpus.reservoirSample(df, Seq("lang"),
        "doc_id", k = 10, seed = "w")
      .select("lang", "sample_rank", "doc_id")
      .orderBy("lang", "sample_rank")
      .collect().toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(md5(concat(col("doc_id").cast("string"), lit(":w"))).asc,
        col("doc_id").asc)
    val win = df.withColumn("sample_rank",
        row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= 10)
      .select("lang", "sample_rank", "doc_id")
      .orderBy("lang", "sample_rank")
      .collect().toSeq
    assert(agg == win)
  }

  test("inclusion frequency across seeds ~ k/n per planted stratum") {
    // 200 ids in two planted strata of 100; k = 20 ⇒ expect each
    // stratum to contribute ~10 of every draw. Over 30 seeds the mean
    // per-stratum share concentrates; accept a generous ±25% band —
    // this checks the GUARANTEE (uniformity), not exact contents.
    val ids = (1L to 200L)
    val strataOf = (id: Long) => if (id <= 100) "a" else "b"
    val counts = scala.collection.mutable.Map("a" -> 0, "b" -> 0)
    for (seed <- 1 to 30) {
      sample(ids, 4, 20, s"seed$seed")
        .foreach(id => counts(strataOf(id)) += 1)
    }
    val total = counts.values.sum
    assert(total == 30 * 20)
    val shareA = counts("a").toDouble / total
    assert(shareA > 0.375 && shareA < 0.625,
      s"stratum share drifted from uniform: $counts")
  }
}
