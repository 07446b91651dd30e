package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Malformed-record AUDITING for semi-structured sources — the
  * production posture the reference's schema-inferred reads silently
  * lack (srx_transformation.py:122, historical_data_transformation.py:21
  * infer schemas and quietly absorb drift): every JSON/CSV line is
  * parsed PERMISSIVE with an explicit `_corrupt_record` channel, so a
  * bad scrape batch surfaces as a QUARANTINE LEDGER (raw payload +
  * source file + recovered partial columns) instead of silently nulled
  * columns or dropped rows.
  *
  * Structure: a TEXT scan + `from_json`/`from_csv` projection, not the
  * file-format readers' internal corrupt column. Two reasons:
  *  - Spark disallows any query whose file scan requires ONLY the
  *    internal corrupt column (`QUERY_ONLY_CORRUPT_RECORD_COLUMN` —
  *    the column is materialized while parsing the requested data
  *    columns), and a quarantine COUNT is exactly such a query; the
  *    documented workaround is caching the batch, which is the wrong
  *    posture for a 100 TB read. Parsing in a projection sidesteps the
  *    restriction structurally — the corrupt channel is an ordinary
  *    derived column.
  *  - the ledger keeps the raw LINE verbatim (the text scan's value),
  *    not the parser's reconstruction.
  *
  * Scale shape: per-line scan work — no extra pass, no shuffle, no
  * cache; clean/quarantine are two filters over the same projected
  * scan, and in a healthy feed the ledger is ~empty. Multi-line
  * (pretty-printed whole-file) JSON cannot be line-framed — audit that
  * shape with the file-format reader plus an explicit cache, per the
  * Spark error's contract; the engine's audited path is for the
  * line-oriented feeds where 100 TB actually arrives. */
object Audited {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    schema.add(CorruptCol, StringType, nullable = true)

  private val opts = Map(
    "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)

  /** Post-parse shape shared by both formats: schema columns, then the
    * corrupt channel — the raw line whenever the parser either flagged
    * it or produced no row at all. */
  private def shape(parsed: DataFrame, schema: StructType,
                    corrupt: Column): DataFrame =
    parsed.select(
      schema.fieldNames.map(f => col(s"r.`$f`").as(f)) :+
        corrupt.as(CorruptCol): _*)

  /** Audit a `value`-column lines frame as JSONL. Pure projection —
    * works identically on a BATCH text scan and a STREAMING text
    * source (readStream.text), which is the point of the line-framed
    * design: the scrape feeds that need quarantine most arrive as
    * streams. */
  def auditJsonLines(lines: DataFrame, schema: StructType): DataFrame = {
    val parsed = lines.select(col("value"),
      from_json(col("value"), withCorrupt(schema), opts).as("r"))
    shape(parsed, schema,
      when(col("r").isNull, col("value"))
        .otherwise(col(s"r.`$CorruptCol`")))
  }

  /** Audit a `value`-column lines frame as CSV. With `header = true`,
    * lines equal to the schema-derived header are dropped — the
    * line-framed equivalent of the csv reader's first-line skip (a
    * DATA line spelling exactly the header would also drop; headers
    * with type-parseable names don't have that shape). */
  def auditCsvLines(lines0: DataFrame, schema: StructType,
                    header: Boolean = true): DataFrame = {
    val headerLine = schema.fieldNames.mkString(",")
    val lines = if (header) lines0.filter(col("value") =!= headerLine)
                else lines0
    val parsed = lines.select(col("value"),
      from_csv(col("value"), withCorrupt(schema), opts).as("r"))
    shape(parsed, schema,
      when(col("r").isNull, col("value"))
        .otherwise(col(s"r.`$CorruptCol`")))
  }

  /** Audited line-oriented (JSONL) read: (schema columns...,
    * _corrupt_record). */
  def readJsonAudited(s: SparkSession, schema: StructType,
                      path: String): DataFrame =
    auditJsonLines(s.read.text(path), schema)

  /** Audited CSV read (see [[auditCsvLines]] for header semantics). */
  def readCsvAudited(s: SparkSession, schema: StructType, path: String,
                     header: Boolean = true): DataFrame =
    auditCsvLines(s.read.text(path), schema, header)

  /** Rows that parsed fully, audit column dropped — the downstream
    * transform input. */
  def clean(audited: DataFrame): DataFrame =
    audited.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine ledger: raw payload + source file + the PERMISSIVE
    * partial results (data columns the parser still recovered). */
  def quarantine(audited: DataFrame): DataFrame =
    audited.filter(col(CorruptCol).isNotNull)
      .withColumn("_source_file", input_file_name())
}
