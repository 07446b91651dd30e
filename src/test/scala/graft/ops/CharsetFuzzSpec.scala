package graft.ops

import java.nio.charset.{Charset, StandardCharsets}

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Seeded fuzz for the BOM-sniff charset decode — the remaining
  * byte-level sniffer verified on a fixed fixture alone
  * (q_charset_decode plants one payload per arm; this plants 1600).
  * Ground truth comes from the JVM's own Charset encoders applied
  * per-case OUTSIDE Spark: encode a random well-formed string with
  * each charset, prepend that charset's mark for the BOM arms, and
  * the decoded struct must return exactly (charset, original string).
  * Well-formed-by-construction payloads keep the ANSI decode from
  * throwing — the op's documented contract pushes malformed feeds to
  * the quarantine posture upstream.
  *
  * The adversarial vocabulary leans on the sniffer's ambiguity edges:
  * a leading U+FEFF in the CONTENT (double-BOM: only the outer mark
  * is stripped), U+FFFE noncharacters, NULs, supplementary-plane
  * pairs (UTF-16's own surrogate mechanism), and strings whose UTF-8
  * bytes begin near the mark prefixes. Fixed seed — failures
  * reproduce. */
@org.scalatest.tags.Slow
class CharsetFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val vocabulary: Array[String] = Array(
    "", "a", "Z", "0", " ", "\t", "\n", "\u00e9", "\u00df",
    "\u03a9", "\u4e2d", "\u6587", "\ud83c\udfe0", "\ud834\udd1e",
    "\ufeff", "\ufffe", "\ufffd", "\u00ef", "\u00bb", "\u00bf",
    "i\u0307", "\u20a4", "\u00a0", "\ufb01", "\u0000")

  private def randomText(rnd: Random): String =
    (0 until rnd.nextInt(12))
      .map(_ => vocabulary(rnd.nextInt(vocabulary.length))).mkString

  private case class Arm(name: String, cs: Charset, bom: Array[Byte])

  // java.nio encoders never emit a mark for these names, so the mark
  // is planted explicitly per arm — exactly what an origin server does
  private val arms = Seq(
    Arm("UTF-8", StandardCharsets.UTF_8,
      Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)),
    Arm("UTF-16LE", StandardCharsets.UTF_16LE,
      Array(0xFF.toByte, 0xFE.toByte)),
    Arm("UTF-16BE", StandardCharsets.UTF_16BE,
      Array(0xFE.toByte, 0xFF.toByte)),
    Arm("UTF-8", StandardCharsets.UTF_8, Array.emptyByteArray))

  test("bomSniffDecode returns the planted (charset, text) on 1600 " +
      "independently encoded payloads") {
    val rnd = new Random(29L)
    val cases = (0 until 400).flatMap { i =>
      val text = randomText(rnd)
      arms.zipWithIndex.map { case (arm, ai) =>
        (i.toLong * 10 + ai, arm.bom ++ text.getBytes(arm.cs),
          arm.name, text)
      }
    }
    val rows = cases.toDF("id", "payload", "want_cs", "want_text")
      .select(col("id"), col("want_cs"), col("want_text"),
        TextOps.bomSniffDecode(col("payload")).as("r"))
      .select(col("id"), col("want_cs"), col("want_text"),
        col("r.charset").as("got_cs"), col("r.text").as("got_text"))
      .collect()
    assert(rows.length === 1600)
    rows.foreach { r =>
      val id = r.getLong(0)
      // a no-BOM payload whose content BEGINS with an encoded mark is
      // indistinguishable from a marked one — the sniffer strips it
      // and labels by the mark, by design; ground truth adjusts the
      // same way (arm 3 = bare UTF-8, whose text may open with U+FEFF
      // -> EF BB BF, or with bytes that ARE no mark prefix otherwise)
      val (wantCs, wantText) =
        if (id % 10 == 3 && r.getString(2).startsWith("\ufeff"))
          ("UTF-8", r.getString(2).substring(1))
        else (r.getString(1), r.getString(2))
      assert(r.getString(3) === wantCs,
        s"charset divergence id=$id: got=${r.getString(3)} want=$wantCs")
      assert(r.getString(4) === wantText,
        s"text divergence id=$id (${wantCs}): " +
          s"got=${r.getString(4).length} chars, want=${wantText.length}")
    }
  }
}
