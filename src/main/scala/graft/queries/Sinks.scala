package graft.queries

/** Helpers for queries that write side-channel sinks (catalog tables
  * produced inside a gate, reused across runs in a warm session). */
object Sinks {

  /** Run a MULTI-WRITE build sequence exactly once per marker: the
    * marker table is created only after the whole sequence completes,
    * so a run that dies between writes (build succeeded, append
    * didn't; postings written, doc-stats not) re-runs the sequence on
    * re-entry instead of a later gate silently serving a half-built
    * store. Single-CTAS sinks don't need this — the catalog entry
    * itself is their completion marker (CTAS registers only after a
    * successful write). */
  def ensureBuilt(s: org.apache.spark.sql.SparkSession,
                  marker: String)(build: => Unit): Unit = {
    if (!s.catalog.tableExists(marker)) {
      build
      graft.ops.Compaction.dropManagedTable(s, marker)
      import s.implicits._
      Seq(1).toDF("ok").write.format("parquet")
        .mode("overwrite").saveAsTable(marker)
    }
  }

  /** Content key for idempotent side-channel sinks: stable while the
    * source file is unchanged, different after regeneration. Fold
    * anything that changes the written CONTENT (operator parameters
    * included) into `extra`, or a stale sink silently verifies. */
  def contentKey(d: String, file: String, extra: String = ""): String = {
    val src = new java.io.File(s"$d/$file")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|${src.length}|${src.lastModified}|$extra"
        .getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }
}
