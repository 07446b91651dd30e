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
}
