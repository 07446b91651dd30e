package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CodeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def signals(filename: String, text: String) = {
    val r = Seq((filename, text)).toDF("filename", "text")
      .select(CodeOps.extVote(col("filename")).as("ext"),
        CodeOps.shebangVote(col("text")).as("sb"),
        CodeOps.keywordCount(col("text")).as("kw"),
        CodeOps.isCode(col("filename"), col("text")).as("code"),
        CodeOps.fenceBlocks(col("text")).as("fences"),
        CodeOps.lineCount(col("text")).as("lines"),
        CodeOps.commentLines(col("text")).as("comments"),
        CodeOps.hasLicenseHeader(col("text")).as("lic"))
      .collect().head
    (r.getBoolean(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))
  }

  test("python file with shebang + keywords: all three votes, is_code") {
    val (ext, sb, kw, code, _, _, _, _) = signals("a.py",
      "#!/usr/bin/env python\nimport os\ndef f(x):\n    return x\n")
    assert(ext && sb && kw >= 3 && code)
  }

  test("prose in a .txt: no votes, not code; 'defend'/'classic' " +
      "don't count as keywords (trailing-space tokens)") {
    val (ext, sb, kw, code, _, _, _, _) = signals("notes.txt",
      "we defend the classic view and returned home with imported goods")
    assert(!ext && !sb && kw == 0 && !code)
  }

  test("code pasted into a .txt still detected: shebang + keywords = " +
      "2 of 3 votes") {
    val (ext, _, _, code, _, _, _, _) = signals("paste.txt",
      "#!/bin/sh\nimport a\nimport b\nclass C: pass\ndef g(): return 1")
    assert(!ext && code)
  }

  test("a .py of prose is NOT code on the extension vote alone") {
    val (ext, sb, kw, code, _, _, _, _) =
      signals("readme.py", "just words here nothing else")
    assert(ext && !sb && kw == 0 && !code)
  }

  test("fence blocks count pairs; comment lines exclude the shebang; " +
      "license header only within the first 160 chars") {
    val (_, _, _, _, fences, lines, comments, lic) = signals("m.md",
      "intro\n```\ncode\n```\n# note\n  // also\n#!not-a-comment\n")
    assert(fences == 1L)
    assert(lines == 8L) // trailing newline keeps a final empty line
    assert(comments == 2L)
    assert(!lic)
    val (_, _, _, _, _, _, _, lic2) =
      signals("l.py", "# Copyright (c) 2024 Example\ncode\n")
    assert(lic2)
    val deep = ("x" * 200) + " Copyright deep in the body"
    val (_, _, _, _, _, _, _, lic3) = signals("l2.py", deep)
    assert(!lic3)
  }
}
