package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType}

/** Global order statistics without the single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY — and every
  * operator that needs a running value along a GLOBAL sort order —
  * collapses the whole table into one task in Spark's window exec: the
  * classic scale cliff (fine at 60k rows, dead at 100 TB). These
  * helpers compute the same answers as a two-pass exclusive prefix
  * scan over a range-repartitioned sort:
  *
  *   pass 1: aggregate ONE scalar per partition (count / min) —
  *           collected to the driver: O(numPartitions) rows, never data;
  *   pass 2: stream each partition once, seeded with its exclusive
  *           prefix (offset / running min) from the pass-1 scan.
  *
  * Both passes are fully parallel; the sorted input is
  * `localCheckpoint`ed so the two passes observe the SAME partition
  * layout (same idiom as [[Components]]). `mapPartitions` here is the
  * genuine per-partition-imperative case — a running accumulator along
  * the partition's sort order — not avoidable with declarative ops
  * without re-introducing the single-partition exchange.
  */
object GlobalOrder {

  /** Range-repartition + in-partition sort, materialized so later
    * passes all see one fixed layout. */
  private def rangeSorted(df: DataFrame, sortCols: Seq[Column],
                          n: Int): DataFrame =
    df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .transform(Checkpoints.spill)

  /** Appends a dense 0-based global row index along `sortCols` (which
    * must be a TOTAL order for the result to be deterministic).
    * Equivalent to `row_number() OVER (ORDER BY sortCols) - 1`, minus
    * the single-partition exchange. */
  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column],
                      out: String = "idx"): DataFrame =
    withGlobalIndexAndCount(df, sortCols, out)._1

  /** [[withGlobalIndex]] plus the TOTAL row count, which comes free
    * from the pass-1 per-partition scalars — callers that need n
    * beside the index (tercile/percentile cuts) would otherwise pay a
    * second full pass (or worse, a recompute of the input lineage)
    * for one number. */
  def withGlobalIndexAndCount(df: DataFrame, sortCols: Seq[Column],
                              out: String = "idx"): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = rangeSorted(df, sortCols, n)
    val counts = sorted
      .groupBy(spark_partition_id().as("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exclusive prefix sums: offset(p) = rows in partitions < p
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until n).map { p =>
        val o = acc; acc += counts.getOrElse(p, 0L); p -> o
      }.toMap
    }
    val width = sorted.schema.length
    val withPid = sorted.withColumn("__pid", spark_partition_id())
    val outSchema = sorted.schema.add(out, LongType, nullable = false)
    val indexed = withPid.mapPartitions { it =>
      var idx = -1L
      it.map { r =>
        if (idx < 0) idx = offsets(r.getInt(width))
        val vals = new Array[Any](width + 1)
        var i = 0
        while (i < width) { vals(i) = r.get(i); i += 1 }
        vals(width) = idx
        idx += 1
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(Encoders.row(outSchema))
    (indexed, counts.values.sum)
  }

  /** 2-D min/min skyline (Pareto frontier): the distinct points not
    * dominated by any other (`q.x <= p.x && q.y <= p.y`, strict in at
    * least one). Single range-sort formulation: along (x asc, y asc),
    * a point is on the frontier iff its y is strictly below the
    * running minimum y of everything before it — pass 1 collects the
    * per-partition min(y), pass 2 filters with the exclusive prefix
    * min. Versus the NOT-EXISTS definition this is O(n log n) instead
    * of O(n^2), and versus the declarative cumulative-min window it
    * needs no single-partition exchange.
    *
    * Inputs are cast to LongType (exact comparison semantics — the
    * callers' cents/milli convention); null dims are excluded, and
    * dominance is evaluated over DISTINCT points (identical points
    * never dominate each other, so duplicates would all survive;
    * callers wanting row multiplicity join back on the point). */
  def skylineMin2D(points: DataFrame, xCol: String,
                   yCol: String): DataFrame = {
    val spark = points.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pts = points
      .select(col(xCol).cast(LongType).as(xCol),
        col(yCol).cast(LongType).as(yCol))
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .distinct()
    val sorted = rangeSorted(pts, Seq(col(xCol).asc, col(yCol).asc), n)
    val mins = sorted
      .groupBy(spark_partition_id().as("__pid"))
      .agg(min(col(yCol)).as("__m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exclusive prefix minima: prefMin(p) = min y in partitions < p
    val prefMin: Map[Int, Long] = {
      var acc = Long.MaxValue
      (0 until n).map { p =>
        val o = acc
        acc = math.min(acc, mins.getOrElse(p, Long.MaxValue))
        p -> o
      }.toMap
    }
    val withPid = sorted.withColumn("__pid", spark_partition_id())
    val outSchema = sorted.schema.add("__keep", BooleanType, nullable = false)
    val flagged = withPid.mapPartitions { it =>
      var run = 0L
      var init = false
      it.map { r =>
        if (!init) { run = prefMin(r.getInt(2)); init = true }
        val y = r.getLong(1)
        val keep = y < run
        if (keep) run = y
        Row(r.getLong(0), y, keep)
      }
    }(Encoders.row(outSchema))
    flagged.where(col("__keep")).drop("__keep")
  }
}
