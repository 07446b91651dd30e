package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.CodeOps

/** Code-corpus curation gates (r12 verdict item 6): detection and
  * code-appropriate quality signals over a planted repo snapshot —
  * every 11th document becomes a synthetic source file (shebang on
  * every 22nd, license header on every 33rd), every 11k+5th gets a
  * fenced code block appended (the mixed prose+code case), the rest
  * stay prose. Both the Spark plant and the DuckDB oracle derive the
  * same corpus from the documents fixture, so the signals are pinned
  * end-to-end. Operators in [[graft.ops.CodeOps]]. */
object CodeQueries {

  /** The planted repo snapshot: (doc_id, filename, text). */
  private def plantedRepo(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ids = id.cast("string")
    val shebang = when(id % 22 === 0, lit("#!/usr/bin/env python\n"))
      .otherwise(lit(""))
    val license = when(id % 33 === 0,
        lit("# Copyright (c) 2024 Example Corp\n" +
          "# Licensed under the MIT License\n"))
      .otherwise(lit(""))
    val body = concat(lit("import os\nimport sys\n\ndef f_"), ids,
      lit("(x):\n    # add the offset\n    return x + "),
      (id % 97).cast("string"),
      lit("\n\nclass C_"), ids, lit(":\n    pass\n"))
    documents(s, d).select(id.as("doc_id"),
      when(id % 11 === 0, concat(lit("src_"), ids, lit(".py")))
        .when(id % 11 === 5, concat(lit("notes_"), ids, lit(".md")))
        .otherwise(concat(lit("doc_"), ids, lit(".txt")))
        .as("filename"),
      when(id % 11 === 0, concat(shebang, license, body))
        .when(id % 11 === 5, concat(col("text"),
          lit("\n```python\ndef g_"), ids,
          lit("(y):\n    return y * 2\n```\n")))
        .otherwise(col("text")).as("text"))
  }

  /** The same plant as a DuckDB CTE (named `cr`). NOTE: this fragment
    * is interpolated into oracle strings that apply stripMargin AGAIN,
    * so no line here may begin with whitespace + `|` — concatenation
    * operators sit at line ENDS. */
  private val plantedSql = """
    |cr AS (SELECT doc_id,
    |  CASE WHEN doc_id % 11 = 0
    |         THEN 'src_' || CAST(doc_id AS VARCHAR) || '.py'
    |       WHEN doc_id % 11 = 5
    |         THEN 'notes_' || CAST(doc_id AS VARCHAR) || '.md'
    |       ELSE 'doc_' || CAST(doc_id AS VARCHAR) || '.txt'
    |  END AS filename,
    |  CASE WHEN doc_id % 11 = 0 THEN
    |      (CASE WHEN doc_id % 22 = 0
    |            THEN '#!/usr/bin/env python' || chr(10) ELSE '' END) ||
    |      (CASE WHEN doc_id % 33 = 0
    |            THEN '# Copyright (c) 2024 Example Corp' || chr(10) ||
    |              '# Licensed under the MIT License' || chr(10)
    |            ELSE '' END) ||
    |      'import os' || chr(10) || 'import sys' || chr(10) ||
    |      chr(10) ||
    |      'def f_' || CAST(doc_id AS VARCHAR) || '(x):' || chr(10) ||
    |      '    # add the offset' || chr(10) ||
    |      '    return x + ' || CAST(doc_id % 97 AS VARCHAR) ||
    |      chr(10) || chr(10) ||
    |      'class C_' || CAST(doc_id AS VARCHAR) || ':' || chr(10) ||
    |      '    pass' || chr(10)
    |    WHEN doc_id % 11 = 5 THEN text || chr(10) ||
    |      '```python' || chr(10) ||
    |      'def g_' || CAST(doc_id AS VARCHAR) || '(y):' || chr(10) ||
    |      '    return y * 2' || chr(10) || '```' || chr(10)
    |    ELSE text
    |  END AS text
    |  FROM documents)""".stripMargin.trim

  /** The detection votes as a DuckDB CTE over `cr` (named `det`). */
  private val detectSql = """
    |det AS (SELECT doc_id, filename, text,
    |  regexp_matches(filename, '\.(py|scala|js|java|go|rs|c)$')
    |    AS ext_vote,
    |  starts_with(text, '#!') AS shebang_vote,
    |  ((len(text) - len(replace(text, 'def ', ''))) // 4
    |   + (len(text) - len(replace(text, 'import ', ''))) // 7
    |   + (len(text) - len(replace(text, 'class ', ''))) // 6
    |   + (len(text) - len(replace(text, 'return ', ''))) // 7) >= 3
    |    AS kw_vote
    |  FROM cr),
    |detc AS (SELECT *,
    |  (CAST(ext_vote AS INT) + CAST(shebang_vote AS INT)
    |    + CAST(kw_vote AS INT)) >= 2 AS is_code,
    |  CAST((len(text) - len(replace(text, '```', ''))) // 3 // 2
    |    AS BIGINT) AS fence_blocks
    |  FROM det)""".stripMargin.trim

  def all: Seq[Q] = Seq(

    // ---- code detection (majority vote) -------------------------------
    // Extension + shebang + keyword-density votes, is_code on >= 2 of
    // 3, plus the fence-block count and the mixed flag (prose doc
    // carrying fenced code). Pure per-row built-ins — scan-speed, no
    // shuffle; at 100 TB this is a projection on the ingest scan.
    Q("q_code_detect",
      (s, d) => {
        plantedRepo(s, d).select(col("doc_id"), col("filename"),
            CodeOps.extVote(col("filename")).as("ext_vote"),
            CodeOps.shebangVote(col("text")).as("shebang_vote"),
            CodeOps.keywordVote(col("text")).as("kw_vote"),
            CodeOps.isCode(col("filename"), col("text")).as("is_code"),
            CodeOps.fenceBlocks(col("text")).as("fence_blocks"))
          .withColumn("is_mixed",
            !col("is_code") && col("fence_blocks") >= 1L)
          .orderBy("doc_id")
      },
      Some(s"""
        |WITH $plantedSql,
        |$detectSql
        |SELECT doc_id, filename, ext_vote, shebang_vote, kw_vote,
        |  is_code, fence_blocks,
        |  (NOT is_code) AND fence_blocks >= 1 AS is_mixed
        |FROM detc ORDER BY doc_id
        |""".stripMargin.trim)),

    // ---- code quality (comment density + license header) --------------
    // Over the DETECTED code files only: line counts, comment-line
    // density in milli (exact truncating division), the
    // license-header vote, and the admit verdict the quality-cutoff
    // machinery consumes (licensed AND <= 500 milli comments — a file
    // that is mostly comments is generated boilerplate, not training
    // signal). Same scan-speed shape as detection.
    Q("q_code_quality",
      (s, d) => {
        plantedRepo(s, d)
          .filter(CodeOps.isCode(col("filename"), col("text")))
          .select(col("doc_id"), col("filename"),
            CodeOps.lineCount(col("text")).as("n_lines"),
            CodeOps.commentLines(col("text")).as("comment_lines"),
            CodeOps.hasLicenseHeader(col("text")).as("has_license"))
          .withColumn("comment_ratio_milli",
            expr("comment_lines * 1000 DIV n_lines"))
          .withColumn("admitted",
            col("has_license") && col("comment_ratio_milli") <= 500L)
          .orderBy("doc_id")
      },
      Some(s"""
        |WITH $plantedSql,
        |$detectSql
        |SELECT doc_id, filename,
        |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(string_split(text, chr(10)),
        |    l -> (starts_with(ltrim(l), '#')
        |            AND NOT starts_with(ltrim(l), '#!'))
        |         OR starts_with(ltrim(l), '//'))) AS BIGINT)
        |    AS comment_lines,
        |  substr(text, 1, 160) LIKE '%Copyright%' AS has_license,
        |  CAST(len(list_filter(string_split(text, chr(10)),
        |    l -> (starts_with(ltrim(l), '#')
        |            AND NOT starts_with(ltrim(l), '#!'))
        |         OR starts_with(ltrim(l), '//'))) AS BIGINT) * 1000
        |    // CAST(len(string_split(text, chr(10))) AS BIGINT)
        |    AS comment_ratio_milli,
        |  substr(text, 1, 160) LIKE '%Copyright%'
        |    AND CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> (starts_with(ltrim(l), '#')
        |              AND NOT starts_with(ltrim(l), '#!'))
        |           OR starts_with(ltrim(l), '//'))) AS BIGINT) * 1000
        |      // CAST(len(string_split(text, chr(10))) AS BIGINT)
        |      <= 500 AS admitted
        |FROM detc WHERE is_code ORDER BY doc_id
        |""".stripMargin.trim))
  )
}
