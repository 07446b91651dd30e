package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Order-insensitive table checksums for snapshot reconciliation — the
  * anti-entropy primitive a 100 TB replication/migration pipeline needs:
  * comparing two copies of a table row-by-row costs a full shuffle-join
  * of both (the [[Merge.diffSnapshots]] path); comparing per-bucket
  * CHECKSUMS costs one partial-aggregable pass over each side and
  * ships only `buckets` rows, after which the row-level diff can be
  * restricted to the few buckets that disagree (the Merkle-tree /
  * DynamoDB anti-entropy pattern, public literature).
  *
  * Determinism: the row digest is md5 over a canonical `|`-joined
  * string (NULLs sentineled, so ("a", NULL) ≠ ("a", "")) — md5 is
  * bit-identical in every engine, which is what lets the DuckDB oracle
  * pin these checksums exactly. The per-bucket fold is (count, SUM of
  * a 60-bit digest slice, XOR of the same slice): commutative,
  * associative, partial-aggregable — Spark's map-side combine does
  * most of the work before the one `buckets`-cardinality shuffle.
  * The sum is taken in DECIMAL(38,0) then reduced mod 2^60 so the
  * published value stays in BIGINT range on every engine regardless
  * of row count (a raw int64 sum would overflow — and throw under
  * ANSI — after ~8 rows of 60-bit values). */
object Reconcile {

  private val Mod60 = "1152921504606846976" // 2^60

  /** Canonical per-row digest: md5 over the concatenation of PER-COLUMN
    * md5s (NULL -> the literal `N`, which no 32-char hex digest can
    * collide with). Hashing each column first makes the encoding
    * injective for arbitrary string content - a separator-join form
    * would confuse ("a|b", "c") with ("a", "b|c") and a NULL sentinel
    * with its literal value. Stable across engines and across row
    * order by construction; ("a", NULL) differs from ("a", "") because
    * md5('') is a digest, not `N`. */
  def rowDigest(cols: Seq[Column]): Column =
    md5(concat_ws("",
      cols.map(c => coalesce(md5(c.cast("string")), lit("N"))): _*))

  /** Per-bucket checksum of `df` over `cols`: `buckets` rows of
    * (bucket, cnt, hsum, hxor). Bucket = first 4 digest hex chars mod
    * `buckets`, so rows distribute uniformly and a localized change
    * perturbs exactly one bucket's triple. */
  def tableChecksum(df: DataFrame, cols: Seq[String],
                    buckets: Int): DataFrame = {
    val digest = rowDigest(cols.map(col))
    val slice60 = conv(substring(digest, 5, 15), 16, 10)
      .cast(DecimalType(38, 0))
    df.select(
        (conv(substring(digest, 1, 4), 16, 10).cast(LongType)
          % buckets).as("bucket"),
        slice60.as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        (sum(col("h")) % expr(s"CAST($Mod60 AS DECIMAL(38,0))"))
          .cast(LongType).as("hsum"),
        bit_xor(col("h").cast(LongType)).as("hxor"))
  }

  /** Bucket-level reconciliation of two snapshots: one row per bucket
    * where the triples disagree, with both sides' (cnt, hsum, hxor)
    * (zeros for a bucket absent on one side). Equal tables → zero
    * rows. A mismatched bucket localizes the diff: re-scan ONLY rows
    * hashing to those buckets with the row-level diff, ~buckets×
    * cheaper than a full-table compare when drift is sparse. */
  def checksumDiff(a: DataFrame, b: DataFrame, cols: Seq[String],
                   buckets: Int): DataFrame = {
    val ca = tableChecksum(a, cols, buckets)
      .withColumnsRenamed(Map("cnt" -> "cnt_a", "hsum" -> "hsum_a",
        "hxor" -> "hxor_a"))
    val cb = tableChecksum(b, cols, buckets)
      .withColumnsRenamed(Map("cnt" -> "cnt_b", "hsum" -> "hsum_b",
        "hxor" -> "hxor_b"))
    ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"),
        coalesce(col("hsum_a"), lit(0L)).as("hsum_a"),
        coalesce(col("hsum_b"), lit(0L)).as("hsum_b"),
        coalesce(col("hxor_a"), lit(0L)).as("hxor_a"),
        coalesce(col("hxor_b"), lit(0L)).as("hxor_b"))
      .filter(col("cnt_a") =!= col("cnt_b") ||
        col("hsum_a") =!= col("hsum_b") ||
        col("hxor_a") =!= col("hxor_b"))
  }
}
