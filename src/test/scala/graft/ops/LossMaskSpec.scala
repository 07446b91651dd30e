package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class LossMaskSpec extends SparkSpec {

  private def run(convs: Seq[(Long, Seq[(String, String)])])
      : Seq[(Long, Long, Long, Long, Long)] = {
    val rows = convs.map { case (id, ts) =>
      Row(id, ts.map { case (r, c) => Row(r, c) })
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, turns ARRAY<STRUCT<role: STRING, content: STRING>>")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    TextOps.lossMaskSpans(df, "doc_id", "turns")
      .orderBy("doc_id", "turn_idx").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
  }

  /** Straight-line reference of the documented offsets. */
  private def reference(convs: Seq[(Long, Seq[(String, String)])])
      : Seq[(Long, Long, Long, Long, Long)] =
    convs.flatMap { case (id, ts) =>
      val cnt = ts.map(_._2.trim.split("[ \t\n\r\f]+", -1).length.toLong)
      val total = cnt.sum
      ts.zipWithIndex.collect {
        case ((role, _), i) if role == "assistant" =>
          (id, total, i.toLong, cnt.take(i).sum, cnt.take(i + 1).sum)
      }
    }.sortBy(t => (t._1, t._3))

  test("hand case: spans tile the token stream; only assistant turns " +
      "emit; empty-content turn counts one token") {
    val convs = Seq(
      1L -> Seq("user" -> "hi there", "assistant" -> "hello hello you",
        "user" -> "ok", "assistant" -> "bye"),
      2L -> Seq("user" -> "solo"),            // no assistant: no rows
      3L -> Seq("assistant" -> "a b c", "user" -> " ")) // ws-only = 1
    val got = run(convs)
    assert(got == Seq(
      (1L, 7L, 1L, 2L, 5L), (1L, 7L, 3L, 6L, 7L),
      (3L, 4L, 0L, 0L, 3L)))
    assert(got == reference(convs))
  }

  test("fuzz: 200 random conversations equal the straight-line " +
      "reference") {
    val rnd = new scala.util.Random(0x10f5L)
    // 'f'-heavy words + tab/formfeed separators + trailing whitespace:
    // the SQL-literal escape bug (\f folding to the letter f, which
    // then tokenized AWAY every f) is exactly the corner a plain-ASCII
    // single-space alphabet can never catch
    val words = Vector("a", "bb", "ccc", "hello", "x1", "fff", "leaf")
    val seps = Vector(" ", "\t", "\f", "  ", " \t")
    val convs = (0 until 200).map { id =>
      val nt = 1 + rnd.nextInt(8)
      id.toLong -> (0 until nt).map { _ =>
        val role = Seq("user", "assistant", "system")(rnd.nextInt(3))
        val body = (0 until 1 + rnd.nextInt(6))
          .map(_ => words(rnd.nextInt(words.size)))
          .reduceLeft((a, b) => a + seps(rnd.nextInt(seps.size)) + b)
        val content = (if (rnd.nextBoolean()) " " else "") + body +
          (if (rnd.nextBoolean()) " " else "")
        role -> content
      }
    }
    assert(run(convs) == reference(convs))
  }
}
