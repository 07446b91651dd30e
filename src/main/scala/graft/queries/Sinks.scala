package graft.queries

/** Helpers for queries that write side-channel sinks (catalog tables
  * produced inside a gate, reused across runs in a warm session). */
object Sinks {

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
