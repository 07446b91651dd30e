package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Pins the PERMISSIVE-audit contract: planted corrupt rows land in
  * the quarantine ledger with their raw payload, clean rows parse
  * fully, and the two channels PARTITION the input (nothing dropped,
  * nothing double-counted) — the property a silent-drift read lacks. */
class AuditedSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def writeLines(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-audit").toFile
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f, "UTF-8")
    try lines.foreach(w.println) finally w.close()
    f.getAbsolutePath
  }

  test("JSON: syntax errors and type mismatches quarantine; channels " +
      "partition the input") {
    val path = writeLines("a.json", Seq(
      """{"id": 1, "v": "alpha"}""",
      """{"id": 2 "v": "beta"}""",      // syntax error: missing comma
      """{"id": "x3", "v": "gamma"}""", // type drift: string into long
      """{"id": 4, "v": "delta"}"""))
    val audited = Audited.readJsonAudited(spark, schema, path)
    val clean = Audited.clean(audited).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(clean == Set((1L, "alpha"), (4L, "delta")))
    val quar = Audited.quarantine(audited)
      .select(Audited.CorruptCol).collect().map(_.getString(0)).toSet
    assert(quar == Set("""{"id": 2 "v": "beta"}""",
      """{"id": "x3", "v": "gamma"}"""))
    assert(Audited.clean(audited).count() +
      Audited.quarantine(audited).count() == audited.count())
    // partial results: the type-drift row still recovers the v column
    val partial = Audited.quarantine(audited)
      .filter(org.apache.spark.sql.functions.col("v") === "gamma").count()
    assert(partial == 1L, "PERMISSIVE must keep recoverable columns")
  }

  test("CSV: type mismatches quarantine with the raw line") {
    val path = writeLines("a.csv", Seq(
      "id,v", "10,kilo", "x11,lima", "12,mike"))
    val audited = Audited.readCsvAudited(spark, schema, path)
    val clean = Audited.clean(audited).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(clean == Set((10L, "kilo"), (12L, "mike")))
    val quar = Audited.quarantine(audited)
      .select(Audited.CorruptCol).collect().map(_.getString(0)).toSeq
    assert(quar == Seq("x11,lima"))
  }
}
