package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the byte-sniffing pair: truncated/empty payloads,
  * magic-lookalike text, RIFF subtype dispatch, BOM stripping, and the
  * UTF-16 surrogate-pair round trip. */
class SniffSpec extends SparkSpec {
  import spark.implicits._

  private def sniff(hexOrText: (String, String)*): Seq[(String, String)] =
    hexOrText.toSeq.toDF("kind", "v")
      .select(col("kind"),
        Multimodal.sniffFormat(
          when(col("kind") === "hex", unhex(col("v")))
            .otherwise(encode(col("v"), "UTF-8"))).as("f"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("sniffFormat: magic routing, lookalikes, truncation, empty") {
    val out = sniff(
      ("hex", "89504E470D0A1A0A00FF"), // png
      ("hex", "89504E47"),             // png seal truncated -> unknown
      ("hex", "FFD8FFDB0043"),         // jpeg, any fourth byte
      ("text", "GIF89a picture bytes"),
      ("text", "GIF89"),               // truncated -> unknown
      ("hex", "524946460A00000057415645AABB"), // wav
      ("hex", "524946460A00000041564920AABB"), // avi
      ("hex", "52494646AABBCCDD"),     // RIFF with no subtype -> unknown
      ("hex", "1F8B08"),               // gzip
      ("text", "%PDF-1.7 body"),
      ("text", "ID3 then audio"),
      ("text", "PDF mentioned mid-text"), // no leading magic
      ("text", ""),                    // empty payload
      ("text", "plain prose"))
    assert(out.map(_._2) === Seq("png", "unknown", "jpeg", "gif",
      "unknown", "wav", "avi", "unknown", "gzip", "pdf", "mp3",
      "unknown", "unknown", "unknown"))
  }

  test("bomSniffDecode: BOM detect + strip, bare default, surrogate " +
    "pairs survive UTF-16 both ways") {
    val texts = Seq("plain ascii", "emoji 🏠 pair", "")
    val planted = texts.zipWithIndex.toDF("t", "i")
      .select(col("t"), col("i"),
        when(col("i") === 0,
          concat(unhex(lit("EFBBBF")), encode(col("t"), "UTF-8")))
        .when(col("i") === 1,
          concat(unhex(lit("FFFE")), encode(col("t"), "UTF-16LE")))
        .otherwise(encode(col("t"), "UTF-8")).as("payload"))
      .select(col("t"), col("i"),
        TextOps.bomSniffDecode(col("payload")).as("r"))
      .select(col("i"), col("r.charset"), col("r.text"), col("t"))
      .collect().sortBy(_.getInt(0))
    assert(planted(0).getString(1) === "UTF-8")
    assert(planted(1).getString(1) === "UTF-16LE")
    assert(planted(2).getString(1) === "UTF-8") // bare -> default label
    // decoded text equals the source, BOM stripped, surrogates intact
    planted.foreach(r => assert(r.getString(2) === r.getString(3)))
    // big-endian path too
    val be = Seq(Tuple1("bé text")).toDF("t")
      .select(TextOps.bomSniffDecode(
        concat(unhex(lit("FEFF")), encode(col("t"), "UTF-16BE"))).as("r"))
      .select(col("r.charset"), col("r.text")).collect().head
    assert(be.getString(0) === "UTF-16BE" && be.getString(1) === "bé text")
  }
}
