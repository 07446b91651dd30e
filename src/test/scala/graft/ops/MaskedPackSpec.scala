package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Conservation laws of the loss-mask × concat-split composition
  * (the q_sft_masked_pack arithmetic), pinned independently of the
  * gate's oracle: window pieces tile each doc exactly, and supervised
  * tokens are conserved — Σ over windows of the span-intersection
  * equals Σ assistant-turn tokens, per doc, for random corpora. */
class MaskedPackSpec extends SparkSpec {

  test("fuzz: window pieces tile docs; supervised tokens conserved") {
    val rnd = new scala.util.Random(0x9acc3dL)
    val words = Vector("a", "bb", "fff", "hello")
    val convs = (0 until 120).map { id =>
      val nt = 1 + rnd.nextInt(6)
      (id.toLong, (0 until nt).map { _ =>
        val role = Seq("user", "assistant")(rnd.nextInt(2))
        val content = (0 until 1 + rnd.nextInt(30))
          .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
        (role, content)
      })
    }
    val rows = convs.map { case (id, ts) =>
      Row(id, ts.map { case (r, c) => Row(r, c) })
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, turns ARRAY<STRUCT<role: STRING, content: STRING>>")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)

    val totals = df.select(col("doc_id"),
      pmod(col("doc_id"), lit(4L)).as("shard"),
      expr("aggregate(transform(turns, t -> CAST(size(split(" +
        "trim(t.content), '[ \\\\t\\\\n\\\\r\\\\f]+')) AS BIGINT))," +
        " 0L, (a, x) -> a + x)").as("n_tokens"))
    val windows = Corpus.concatSplitWindows(totals,
      "shard", "doc_id", "n_tokens", window = 64L)
      .select(col("doc_id"), col("n_tokens"), col("win"),
        col("a_tok"), col("b_tok"))
    val spans = TextOps.lossMaskSpans(df, "doc_id", "turns")
      .select(col("doc_id"), col("a_tok").as("sa"),
        col("b_tok").as("sb"))

    // 1) tiling: per doc, window pieces are disjoint, ordered, and
    //    sum to exactly n_tokens
    val tiles = windows.groupBy("doc_id")
      .agg(sum(col("b_tok") - col("a_tok")).as("covered"),
        max(col("n_tokens")).as("n"),
        min(col("a_tok")).as("first"))
      .collect()
    tiles.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)} tiling")
      assert(r.getLong(3) == 0L, s"doc ${r.getLong(0)} starts at 0")
    }

    // 2) conservation: per doc, Σ window∩span == Σ assistant tokens
    val overlap = windows.join(spans, Seq("doc_id"), "left")
      .groupBy("doc_id")
      .agg(sum(when(col("sa").isNull, lit(0L))
        .otherwise(greatest(lit(0L),
          least(col("sb"), col("b_tok")) -
            greatest(col("sa"), col("a_tok")))))
        .as("supervised"))
    // window multiplicity: each span token lies in exactly one window
    // piece of its doc, so the join-side double count cannot happen
    val assistTotals = spans.groupBy("doc_id")
      .agg(sum(col("sb") - col("sa")).as("assist"))
    val joined = overlap.join(assistTotals, Seq("doc_id"), "left")
      .select(col("doc_id"), col("supervised"),
        coalesce(col("assist"), lit(0L)).as("assist"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: supervised ${r.getLong(1)} != " +
          s"assistant ${r.getLong(2)}")
    }
  }
}
