package graft

import graft.sources.CodeIngest

/** Specs for the code-corpus prep trio (license screen, comment scanner,
  * secret screen). The oracle gates cover the distributed paths; these
  * pin the scanners' edge semantics. */
class CodeIngestSpec extends SparkSpec {

  test("comment scanner: string literals never open or close comments") {
    val sc = CodeIngest.scanComments(
      "var s = \"a // b and /* c */ d\";\n// real line\n/* real block */\n")
    assert(sc.nLine === 1 && sc.nBlock === 1)
    assert(sc.blocks === Seq(" real block "))
    // the stripped code keeps the string content verbatim
    assert(sc.stripped.contains("a // b and /* c */ d"))
    assert(!sc.stripped.contains("real line") && !sc.stripped.contains("real block"))
  }

  test("comment scanner: escapes, unterminated constructs, empty input") {
    // escaped quote does not close the string; the // after it is inert
    val sc = CodeIngest.scanComments("var s = \"say \\\" // not a comment\";")
    assert(sc.nLine === 0)
    // unterminated block comment consumes to EOF
    val sc2 = CodeIngest.scanComments("code /* runs to eof")
    assert(sc2.nBlock === 1 && sc2.blocks === Seq(" runs to eof"))
    assert(CodeIngest.scanComments("").nLine === 0)
  }

  test("docstring picks the doc-comment block, not the license block") {
    for (id <- Seq(1L, 3L)) { // header-license slots: license block comes first
      val code = CodeIngest.buildCode(id, "The body text.")
      assert(CodeIngest.docstring(CodeIngest.scanComments(code)) === "The body text.")
    }
    assert(CodeIngest.docstring(CodeIngest.scanComments("/* plain */ x")) === "")
  }

  test("license detection: SPDX wins, headers match normalized, BSD covered") {
    assert(CodeIngest.detectLicense(
      "// SPDX-License-Identifier: GPL-3.0-only\n/* Permission is hereby granted, free of charge */")
      === (("GPL-3.0-only", "spdx")))
    assert(CodeIngest.detectLicense(
      "/* PERMISSION   IS\n * hereby granted, FREE of charge */ code")
      === (("MIT", "header")))
    assert(CodeIngest.detectLicense(
      "/* Redistribution and use in source and binary forms */ x")
      === (("BSD-3-Clause", "header")))
    assert(CodeIngest.detectLicense("function f() {}") === (("NONE", "none")))
    // a phrase in the SECOND block must not count — only the first
    // block is a header candidate
    assert(CodeIngest.detectLicense(
      "/* just a comment */ /* Licensed under the Apache License, Version 2.0 */")
      === (("NONE", "none")))
  }

  test("secret rules: planted tokens flag, decoys do not") {
    val code = CodeIngest.buildCode(12L, "body") // 12: aws(%2), hex(%3), entropy(%4)
    assert(CodeIngest.secretCounts(code)
      === Seq(("aws", 1L), ("entropy", 1L), ("hex40", 1L)))
    val none = CodeIngest.buildCode(1L, "body") // 1: none planted
    assert(CodeIngest.secretCounts(none).isEmpty)
    // boundary behavior: 40-hex inside a longer hex run must NOT match
    assert(CodeIngest.secretCounts("x" + CodeIngest.hexToken(5L) + "0").isEmpty)
    // the entropy screen needs >= 20 distinct chars
    assert(CodeIngest.secretCounts("\"" + "ab" * 16 + "\"").isEmpty)
  }

  test("entropy token construction clears the distinct-char bar") {
    for (id <- Seq(0L, 4L, 196L)) {
      val t = CodeIngest.entropyToken(id)
      assert(t.length === 32 && t.distinct.length === 32)
    }
  }
}
