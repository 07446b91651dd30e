package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Precedence and format edges for [[Licensing.detectLicense]] beyond
  * the gate's planted classes. */
class LicensingSpec extends SparkSpec {
  import spark.implicits._

  private def detect(pages: String*): Seq[String] =
    pages.toSeq.toDF("p")
      .select(Licensing.detectLicense(col("p"))).collect()
      .map(_.getString(0)).toSeq

  test("cc variants: code case-folds, version survives, cc0 maps") {
    assert(detect(
      """<a rel="license" href="https://CreativeCommons.org/licenses/BY-NC-ND/3.0/">x</a>""",
      """<link href='http://creativecommons.org/licenses/by/2.5/' rel='license'/>""",
      """<a rel="license" href="https://creativecommons.org/publicdomain/zero/1.0/legalcode">pd</a>""") ===
      Seq("cc-by-nc-nd-3.0", "cc-by-2.5", "cc0-1.0"))
  }

  test("precedence: license link beats SPDX beats plain text; " +
    "rel=\"stylesheet\" links never match") {
    assert(detect(
      "<a rel=\"license\" href=\"https://creativecommons.org/licenses/by/4.0/\">l</a>" +
        " SPDX-License-Identifier: MIT All rights reserved",
      "SPDX-License-Identifier: Apache-2.0\nAll Rights Reserved",
      "body ALL RIGHTS RESERVED footer",
      """<link rel="stylesheet" href="https://example.com/style.css">plain""") ===
      Seq("cc-by-4.0", "spdx:Apache-2.0", "all-rights-reserved", "none"))
  }

  test("spdx id keeps its case and symbols; bare pages report none") {
    assert(detect(
      "// SPDX-License-Identifier: GPL-3.0-or-later",
      "no signals at all") ===
      Seq("spdx:GPL-3.0-or-later", "none"))
  }
}
