package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two properties content-defined chunking exists for, fuzzed:
  *
  *  1. cross-implementation: the Column pipeline (charCodes →
  *     cdcBounds) equals a straight-line JVM replay of the documented
  *     formula — boundary after 1-based position i ≥ 8 when
  *     Σ_{j<8} code(i−j)·31^j ≡ 0 (mod mask);
  *  2. LOCALITY: a single edit (substitute / insert / delete) leaves
  *     every boundary at or before the edit untouched and every
  *     boundary beyond a 2-window safety margin shifted by exactly
  *     the length delta — the property chunk-level dedup relies on
  *     (an edit must not re-chunk the whole document).
  *
  * ASCII alphabet (ascii() reads code points; multibyte is out of the
  * chunker's documented scope), mask 16 for boundary density. */
@org.scalatest.tags.Slow
class CdcPropertyFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val mask = 16
  private val w = 8

  private def refCuts(s: String): Seq[Int] =
    (w to s.length).filter { i =>
      val h = (0 until w).map(j =>
        s.charAt(i - 1 - j).toLong * math.pow(31, j).toLong).sum
      h % mask == 0
    }

  private def refBounds(s: String): Seq[Int] = 0 +: refCuts(s) :+ s.length

  private def sparkBounds(texts: Seq[String]): Seq[Seq[Int]] = {
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextOps.cdcBounds(
        TextOps.charCodes(col("text")), mask).as("b"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    texts.indices.map(i => rows(i.toLong))
  }

  private def randText(rnd: Random): String =
    (0 until 40 + rnd.nextInt(160))
      .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString

  test("cdcBounds == straight-line JVM replay on 100 random strings " +
      "(plus the under-window and empty edges)") {
    val rnd = new Random(6L)
    val texts = Seq("", "abc", "a" * 7) ++
      (0 until 100).map(_ => randText(rnd))
    sparkBounds(texts).zip(texts).foreach { case (got, t) =>
      assert(got === refBounds(t), s"bounds diverged on: $t")
    }
  }

  test("locality: one edit never moves boundaries at/before the edit " +
      "nor (beyond a 2-window margin) after it — 150 random edits") {
    val rnd = new Random(29L)
    val cases = (0 until 150).map { _ =>
      val s = randText(rnd)
      val p = rnd.nextInt(s.length)
      val edited = rnd.nextInt(3) match {
        case 0 => s.updated(p, ('a' + rnd.nextInt(5)).toChar)  // sub
        case 1 => s.substring(0, p) + ('a' + rnd.nextInt(5)).toChar +
          s.substring(p)                                        // insert
        case 2 => s.substring(0, p) + s.substring(p + 1)        // delete
      }
      (s, edited, p)
    }
    val all = sparkBounds(cases.flatMap { case (a, b, _) => Seq(a, b) })
    cases.zipWithIndex.foreach { case ((s, e, p), i) =>
      val (bs, be) = (all(2 * i), all(2 * i + 1))
      val delta = e.length - s.length
      // interior cuts only (0 and n are structural)
      val cs = bs.drop(1).dropRight(1)
      val ce = be.drop(1).dropRight(1)
      assert(cs.filter(_ <= p) === ce.filter(_ <= p),
        s"case $i: a boundary at/before the edit (p=$p) moved\n$s\n$e")
      val m = p + 2 * w
      assert(cs.filter(_ + delta > m).map(_ + delta) ===
        ce.filter(_ > m),
        s"case $i: a far boundary beyond the margin (p=$p, " +
          s"delta=$delta) did not shift cleanly\n$s\n$e")
    }
  }
}
