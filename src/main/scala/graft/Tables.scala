package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{DataType, LongType, StructType,
  TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet per table under the scale-factor directory. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** Canonical `ts` conversion: EPOCH-MICROS int64, whatever the fixture
    * stored. Driver regenerations have flipped `events.ts` between
    * TIMESTAMP(NANOS) (readable only as raw int64 via `nanosAsLong`) and
    * TIMESTAMP(MICROS); dispatch on the LOADED type and refuse anything
    * unrecognized — a silent coercion here mislabels every event time
    * downstream while the DuckDB oracle's `epoch_us(ts)` stays right.
    * `unix_micros` on TimestampType returns the internal value verbatim
    * (no timezone math), and forcing the read type to TimestampType via
    * an EXPLICIT read schema loads the stored micros as that internal
    * value directly — exact and independent of session TZ, with no
    * session-wide conf mutation (flipping
    * `spark.sql.parquet.inferTimestampNTZ.enabled` here would change
    * how `o_orderdate`/`l_shipdate` load in every LATER read of the
    * same session — an ordering hazard). */
  def tsToMicros(dt: DataType): Column = dt match {
    case LongType      => expr("ts div 1000") // legacy int64 epoch-nanos
    case TimestampType => unix_micros(col("ts")) // internal value IS epoch-us
    case other => throw new IllegalStateException(
      s"events.ts read as unsupported type $other — expected " +
        "TIMESTAMP(MICROS) or int64 nanos; update Tables.tsToMicros " +
        "for the new fixture contract")
  }

  /** The read schema for the events fixture: as inferred, except a
    * timestamp `ts` (NTZ or not) is pinned to TimestampType so the
    * stored micros load as the internal epoch-us value verbatim.
    * Returns None (read as inferred) for the legacy long-nanos layout;
    * throws on any type [[tsToMicros]] would refuse, so a regenerated
    * fixture fails LOUDLY at the boundary instead of mislabeling. */
  private[graft] def eventsReadSchema(
      inferred: StructType): Option[StructType] =
    inferred("ts").dataType match {
      case LongType => None
      case TimestampType | _: TimestampNTZType => Some(StructType(
        inferred.map(f =>
          if (f.name == "ts") f.copy(dataType = TimestampType) else f)))
      case other => throw new IllegalStateException(
        s"events.ts stored as unsupported type $other — expected " +
          "TIMESTAMP(MICROS) or int64 nanos")
    }

  /** Footer-read memo keyed by the fixture's CONTENT hash
    * ([[graft.queries.Sinks.fileContentHash]]) — the value is ONE
    * discipline with the content-keyed stores (identifiers derive
    * from bytes), NOT stronger in-session staleness detection:
    * fileContentHash itself memoizes per (path, length, mtime), so a
    * same-session regeneration preserving both still serves the old
    * hash — the documented residual risk, closed structurally by a
    * fresh JVM (empty memo) and practically by any length/mtime
    * change. Costs one full file read per session per fixture.
    * The inferred events schema is
    * needed on every [[events]]/eventsStream call (~25 gates), and
    * the file listing + footer parse would otherwise repeat on each.
    * ONLY local files the JVM can stat-and-hash are memoized — paths
    * java.io.File cannot see (object stores, momentarily missing
    * files) read the footer each time instead. */
  private val eventsSchemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private[graft] def eventsInferredSchema(s: SparkSession,
                                          path: String): StructType = {
    val f = new java.io.File(path)
    if (f.isFile)
      eventsSchemaMemo.computeIfAbsent(
        s"$path|${graft.queries.Sinks.fileContentHash(f)}",
        _ => s.read.parquet(path).schema)
    else s.read.parquet(path).schema
  }

  /** Events table with `ts` NORMALIZED to epoch-micros LongType at the
    * read boundary ([[tsToMicros]]) — every consumer treats `ts` as
    * exact epoch-microseconds and the DuckDB oracle matches with
    * `epoch_us(ts)`. */
  def events(s: SparkSession, d: String): DataFrame = {
    // harmless when ts is MICROS; keeps a NANOS fixture readable
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$d/events.parquet"
    val inferred = eventsInferredSchema(s, path)
    val raw = eventsReadSchema(inferred) match {
      case Some(sch) => s.read.schema(sch).parquet(path)
      case None      => s.read.parquet(path)
    }
    raw.withColumn("ts", tsToMicros(raw.schema("ts").dataType))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
