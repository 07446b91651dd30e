package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Similarity, TextOps}

/** A/B + stage-attribution harness for the exact set-similarity join:
  * counts prefix collisions and post-distinct candidates with and
  * without the PPJoin positional prune, times each pipeline stage
  * (shingle materialization → prefix pack → candidate join → verify)
  * separately, and interleaves wall-clock runs of the full query.
  * Run: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.SetSimAB`. */
object SetSimAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // replicate SimQueries.corpus (docs + truncated mutations)
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    val toksC = TextOps.tokens(col("text"))
    val docs = raw.select(col("doc_id").as("id"), col("text"))
      .unionByName(raw.filter(size(TextOps.tokens(col("text"))) >= 10)
        .select((col("doc_id") + 1000000L).as("id"),
          array_join(slice(toksC, lit(1), size(toksC) - 2), " ").as("text")))
      .withColumn("shingles", TextOps.wordShingles(col("text"), 3))
      .filter(size(col("shingles")) > 0)
      .select("id", "shingles")
    val t = 800

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- staged replica of Similarity.setSimilarityPairsExact --------
    val mat = timed("mat (shingle + distinct, checkpointed)") {
      docs.select(col("id"), array_distinct(col("shingles")).as("shingles"))
        .repartition(32, col("id")).localCheckpoint()
    }
    val toks = mat.select(col("id"), explode(col("shingles")).as("t"))
    val freq = toks.groupBy("t").agg(count(lit(1)).as("f"))
    val packed = toks.join(freq, "t").groupBy("id")
      .agg(sort_array(collect_list(struct(col("f"), col("t")))).as("st"))
      .withColumn("n", size(col("st")))
      .withColumn("plen", greatest(lit(1),
        (col("n") - ceil(col("n") * t / 1000.0) + 1).cast("int")))
    val prefixes = timed("prefix pack (freq + sort + slice, checkpointed)") {
      packed
        .select(col("id"), col("n"),
          posexplode(slice(col("st"), lit(1), col("plen"))))
        .select(col("id"), col("n"), col("col.t").as("t"),
          (col("pos") + 1).as("i"))
        .localCheckpoint()
    }
    val base = prefixes.as("a").join(prefixes.as("b"),
      col("a.t") === col("b.t") && col("a.id") < col("b.id") &&
        col("a.n") * 1000 >= col("b.n") * t &&
        col("b.n") * 1000 >= col("a.n") * t)
    val pos = base.filter(
      (lit(1) + least(col("a.n") - col("a.i"), col("b.n") - col("b.i"))) *
        (1000 + t) >= (col("a.n") + col("b.n")) * t)
    println(s"prefix rows: ${prefixes.count()}")
    println(s"collisions no-pos: ${base.count()}  with-pos: ${pos.count()}")
    val cands = timed("candidate join + distinct") {
      val c = pos.select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct().localCheckpoint()
      println(s"cand pairs no-pos: " +
        base.select(col("a.id"), col("b.id")).distinct().count() +
        "  with-pos: " + c.count())
      c
    }
    timed("verify (payload rejoin + exact jaccard)") {
      cands
        .join(mat.select(col("id").as("id_a"), col("shingles").as("sh_a")),
          "id_a")
        .join(mat.select(col("id").as("id_b"), col("shingles").as("sh_b")),
          "id_b")
        .withColumn("jaccard_milli",
          Similarity.jaccardMilli(col("sh_a"), col("sh_b")))
        .filter(col("jaccard_milli") >= t)
        .write.format("noop").mode("overwrite").save()
    }
    // ---- end-to-end, as the gate runs it -----------------------------
    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (_ <- 1 to 3)
      time("full query")(Similarity.setSimilarityPairsExact(docs, t))
    spark.stop()
  }
}
