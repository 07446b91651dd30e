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
    * successful write).
    *
    * `requires` lists the DATA tables the marker vouches for: the
    * marker alone is not trusted, because a maintenance pass can
    * remove a data table while the marker survives (e.g.
    * [[graft.ops.Compaction.compactPartitionedTable]] dying between
    * its DROP and the staged RENAME) — if any required table is
    * missing the marker is dropped and the sequence re-runs. */
  def ensureBuilt(s: org.apache.spark.sql.SparkSession,
                  marker: String, requires: Seq[String] = Seq.empty)
                 (build: => Unit): Unit = {
    // Per-marker JVM lock + session build log (see
    // [[graft.ops.StoreLedger]]): Bench's parallel prepare pool may
    // reach the SAME shared store from two threads — without the lock
    // both see "not built" and race the overwrite. The second thread
    // blocks, re-checks, and serves the finished store. Locks are per
    // marker, so DISTINCT stores still build fully in parallel.
    graft.ops.StoreLedger.lockFor(marker).synchronized {
      val complete = s.catalog.tableExists(marker) &&
        requires.forall(s.catalog.tableExists)
      if (!complete) {
        graft.ops.Compaction.dropManagedTable(s, marker)
        build
        import s.implicits._
        Seq(1).toDF("ok").write.format("parquet")
          .mode("overwrite").saveAsTable(marker)
      }
      graft.ops.StoreLedger.record(marker, ran = !complete,
        tables = marker +: requires)
    }
  }

  /** The single-CTAS sibling of [[ensureBuilt]]: run `build` once per
    * `table` under the table's [[graft.ops.StoreLedger]] lock. For
    * one-write sinks the catalog entry is the completion marker (CTAS
    * registers only after a successful write), so no marker table is
    * needed — but the LOCK is: Bench's parallel prepare pool reaches
    * shared tables (the corpus shingle table feeds four prepares) from
    * several threads, and two bare exists-checks then race the same
    * output committer directory (observed: `_temporary/0 does not
    * exist` on the shingle store, round 13). */
  def buildOnce(s: org.apache.spark.sql.SparkSession, table: String)
               (build: => Unit): Unit =
    graft.ops.StoreLedger.lockFor(table).synchronized {
      val exists = s.catalog.tableExists(table)
      if (!exists) build
      graft.ops.StoreLedger.record(table, ran = !exists,
        tables = Seq(table))
    }

  /** Content key for idempotent side-channel sinks: an MD5 over the
    * source file's actual BYTES (plus `extra`), so a regeneration that
    * happens to preserve byte length within mtime granularity still
    * changes the key — (length, mtime) keys cannot promise that. Fold
    * anything that changes the written CONTENT (operator parameters
    * included) into `extra`, or a stale sink silently verifies.
    * Memoized per (path, length, mtime) so repeated calls in a session
    * don't re-read the file; a changed file re-hashes. */
  def contentKey(d: String, file: String, extra: String = ""): String = {
    val src = new java.io.File(s"$d/$file")
    val memoKey = (src.getAbsolutePath, src.length, src.lastModified)
    val bytesHex = hashMemo.computeIfAbsent(memoKey, _ => hashFile(src))
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|$bytesHex|$extra".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }

  private val hashMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), String]()

  /** The memoized content hash of a local file — the same bytes-MD5
    * (and the same per-JVM (path, length, mtime) re-hash policy)
    * backing [[contentKey]], exposed so other content-keyed memos
    * (Tables' events schema memo) share one discipline instead of
    * inventing weaker stat keys. */
  private[graft] def fileContentHash(f: java.io.File): String =
    hashMemo.computeIfAbsent(
      (f.getAbsolutePath, f.length, f.lastModified), _ => hashFile(f))

  private def hashFile(f: java.io.File): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    if (f.isFile) {
      val in = new java.io.FileInputStream(f)
      try {
        val buf = new Array[Byte](1 << 20)
        var n = in.read(buf)
        while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
    } else md.update(s"${f.length}|${f.lastModified}".getBytes("UTF-8"))
    md.digest().map(b => f"$b%02x").mkString
  }
}
