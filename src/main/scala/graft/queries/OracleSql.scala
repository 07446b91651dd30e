package graft.queries

/** Shared oracle-SQL fragments. The cents/sum conventions are part of
  * the engine-portability contract (AggQueries' determinism note): a
  * rounding change here must change every oracle at once, never one
  * query file at a time. */
private[queries] object OracleSql {

  /** Double → exact integer cents, half-up — the SQL twin of the
    * Spark-side `floor(c * 100 + 0.5).cast(LongType)`. */
  val cents: String => String = e =>
    s"CAST(floor(($e) * 100 + 0.5) AS BIGINT)"

  /** DuckDB widens sum(BIGINT) to HUGEINT (int128); the driver gate
    * hashes that differently from Spark's int64. Every oracle sum over
    * integers must come back down to BIGINT explicitly. */
  val sumB: String => String = e => s"CAST(sum($e) AS BIGINT)"

  /** Cosine similarity in milli over two 64-dim float lists — MUST
    * mirror `GraftFunctions.cosineMilli` operation-for-operation (cast
    * to double, sequential sum) so IEEE results are bit-identical.
    * Same recipe as SimQueries' private twin. */
  def cosMilli(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, 65), i -> " +
        s"CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"CAST(floor(1000.0 * (${dot(a, b)} / " +
      s"(sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))) + 0.5) AS BIGINT)"
  }

  /** Milli-quantized long vector from a float list — the SQL twin of
    * [[graft.ops.Clustering.quantizeMilli]]. */
  def quantMilli(v: String, dim: Int): String =
    s"list_transform(range(1, ${dim + 1}), i -> " +
      s"CAST(floor(CAST($v[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT))"

  /** Exact integer squared-L2 over two BIGINT lists — the SQL twin of
    * [[graft.ops.Clustering.l2sqLong]] (already BIGINT-cast). */
  def l2sqList(a: String, b: String, dim: Int): String =
    s"CAST(list_sum(list_transform(range(1, ${dim + 1}), i -> " +
      s"($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
}
