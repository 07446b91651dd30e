package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernandez & Stolfo 1995) — the
  * record-linkage alternative to hash blocking: sort the corpus by a
  * blocking key and compare each row only to its `window - 1`
  * successors in the GLOBAL sort order. Near-duplicates with unequal
  * hash-block keys (typos in the key itself) still land adjacent, and
  * the candidate count is exactly `(window - 1) * n` — no quadratic
  * hot block, the failure mode of hash blocking under skew.
  *
  * Built on [[GlobalOrder.withGlobalIndex]], so the sort is a range
  * repartition + prefix scan, never a single-partition window. The
  * pair expansion ships (idx, id) ROWS ONLY — payloads stay behind and
  * are re-joined by the caller for the verify step (the id-only
  * shuffle discipline of [[Similarity.editDistanceJoin]]).
  *
  * `sortCols` must be a TOTAL order (append the id) for deterministic
  * output, and ASCII-normalized when string-typed if an external
  * oracle replays the sort (collation parity). */
object Blocking {

  /** Candidate id pairs within `window - 1` positions of each other:
    * (`id_a`, `id_b`) with id_a the earlier row. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
                              sortCols: Seq[Column],
                              window: Int): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val indexed = GlobalOrder
      .withGlobalIndex(df, sortCols :+ col(idCol), "__idx")
      .select(col("__idx"), col(idCol))
      .localCheckpoint() // two consumers below; compute the scan once
    val right = indexed
      .select(col("__idx").as("__ridx"), col(idCol).as("id_b"))
    indexed
      .select(col("__idx"), col(idCol).as("id_a"))
      .withColumn("__j",
        explode(array((1 until window).map(lit(_)): _*)))
      .withColumn("__ridx", col("__idx") + col("__j"))
      .join(right, "__ridx")
      .select(col("id_a"), col("id_b"))
  }
}
