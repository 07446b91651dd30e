package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout: sort rows by the bit-interleave
  * of two normalized dimensions before writing, so parquet row-group
  * min/max statistics become TIGHT ON BOTH dimensions at once — a
  * filter on either column (or both) skips most row groups at the I/O
  * layer. Single-column sorting gives perfect pruning on one dimension
  * and none on the other; the Morton curve trades a little of each for
  * locality in both — the standard lakehouse layout for two hot filter
  * columns that don't correlate.
  *
  * Scale shape: one range-exchange on the z-value + an intra-partition
  * sort, paid once at write time (same cost class as any sorted write);
  * readers get row-group skipping forever after. The z-value is a pure
  * per-row expression (64 shift/or terms, codegen'd, no UDF). */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. */
  def interleaveBits(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      acc.bitwiseOR(abit).bitwiseOR(bbit)
    }
  }

  /** Linear-scale a numeric column into [0, 2^bits): layout-only math
    * — monotonic is all that matters, exactness doesn't (a value's
    * bucket moves the row along the curve, never out of the result). */
  def normalize(c: Column, minV: Column, maxV: Column,
                bits: Int): Column = {
    val span = maxV.cast("double") - minV.cast("double")
    when(span <= 0.0, lit(0L)).otherwise(
      ((c.cast("double") - minV.cast("double"))
        * ((1L << bits) - 1) / span).cast("long"))
  }

  /** Write `df` as z-ordered parquet on (colA, colB) and return the
    * relation read back. Dimension ranges come from one small
    * min/max aggregate; rows are range-partitioned and sorted by the
    * z-value so each of `files` output files covers a compact curve
    * segment. Idempotent per path: an existing _SUCCESS marker skips
    * the rewrite (content-keyed paths make staleness the caller's
    * contract, mirroring the streaming sink pattern). */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String, bits: Int = 16,
                    files: Int = 8): DataFrame = {
    val s = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      val mm = df.agg(
        min(col(colA)).as("a_min"), max(col(colA)).as("a_max"),
        min(col(colB)).as("b_min"), max(col(colB)).as("b_max")).head()
      val z = interleaveBits(
        normalize(col(colA), lit(mm.get(0)), lit(mm.get(1)), bits),
        normalize(col(colB), lit(mm.get(2)), lit(mm.get(3)), bits),
        bits)
      df.withColumn("__z", z)
        .repartitionByRange(files, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path)
  }
}
