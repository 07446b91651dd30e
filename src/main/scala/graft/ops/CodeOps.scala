package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Code-corpus detection and quality signals — the slice of the
  * text-quality family that the natural-language heuristics (stopword
  * ratio, repetition, langid) misfire on: a large fraction of a real
  * LLM pretraining corpus is CODE, and curation needs to (a) detect
  * it, (b) score it with code-appropriate signals (comment density,
  * license headers) instead of prose signals.
  *
  * Detection is a MAJORITY VOTE of three independent cheap signals —
  * the langMixture pattern applied to the code/prose boundary: file
  * extension, shebang line, and keyword density. No single signal is
  * trusted alone (a .txt paste of code still has keywords; a .py file
  * of prose docs still has the extension).
  *
  * Everything is a codegen-friendly Column expression over built-ins
  * (literal `replace` counting, one `filter` HOF for comment lines) —
  * scan-speed per row, no UDFs, no shuffles. Integer outputs
  * throughout so a DuckDB oracle pins every signal bit-for-bit (the
  * one internal double division is an exact integer quotient: the
  * length delta is a multiple of the token length by construction). */
object CodeOps {

  /** Occurrences of literal `token` in `c` — length-delta over literal
    * `replace` (no regex engine in the hot path; same trick replays in
    * any SQL engine). */
  def literalCount(c: Column, token: String): Column =
    ((length(c) - length(replace(c, lit(token), lit("")))).cast("long")
      / lit(token.length.toLong)).cast("long")

  /** Extension vote: filename carries a known code extension. */
  def extVote(filename: Column): Column =
    filename.rlike("\\.(py|scala|js|java|go|rs|c)$")

  /** Shebang vote: the text's FIRST bytes are an interpreter line. */
  def shebangVote(text: Column): Column = text.startsWith("#!")

  /** Keyword density: total occurrences of four code keywords (with
    * their trailing space, so prose "classic"/"defend" don't count). */
  def keywordCount(text: Column): Column =
    Seq("def ", "import ", "class ", "return ")
      .map(literalCount(text, _))
      .reduce(_ + _)

  /** Keyword vote: at least 3 keyword hits. */
  def keywordVote(text: Column): Column = keywordCount(text) >= 3L

  /** Majority vote over the three signals. */
  def isCode(filename: Column, text: Column): Column =
    (extVote(filename).cast("int") + shebangVote(text).cast("int") +
      keywordVote(text).cast("int")) >= 2

  /** Fenced code blocks (``` pairs) — the mixed prose+code signal:
    * a doc that is NOT majority-code but carries fences is the
    * "language mixture" case a curation split routes separately. */
  def fenceBlocks(text: Column): Column =
    (literalCount(text, "```") / lit(2L)).cast("long")

  /** Lines whose first non-blank character opens a comment (`#`,
    * excluding the shebang, or `//`) — one `filter` HOF over the
    * line split, per-row work only. */
  def commentLines(text: Column): Column =
    size(filter(split(text, "\n"), l =>
      (ltrim(l).startsWith("#") && !ltrim(l).startsWith("#!")) ||
        ltrim(l).startsWith("//"))).cast("long")

  /** Total lines (split on newline; a trailing newline yields a final
    * empty line in BOTH Spark and DuckDB — kept, deterministic). */
  def lineCount(text: Column): Column =
    size(split(text, "\n")).cast("long")

  /** License-header vote: a Copyright notice within the first 160
    * chars (header position matters — a LICENSE string deep in the
    * body is data, not a grant). */
  def hasLicenseHeader(text: Column): Column =
    substring(text, 1, 160).contains("Copyright")
}
