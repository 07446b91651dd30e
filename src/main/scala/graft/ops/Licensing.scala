package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** License detection over stored pages — the licensing half of crawl
  * governance (the robots half: [[Robots]]): a training-corpus release
  * must be able to say, per source, what fraction of its documents
  * carry which license signal, and re-audit that answer retroactively
  * over the stored corpus. Detection is per-row scan work (class/rel-
  * anchored regex + a when-chain — no UDF, no shuffle); the rollup is
  * one partial-aggregable group-by.
  *
  * Signal precedence, strongest declaration first (a page carrying
  * several signals reports the most machine-readable one):
  *  1. `rel="license"` link target (the RDFa/HTML convention): a
  *     creativecommons.org `/licenses/<code>/<ver>/` target maps to
  *     `cc-<code>-<ver>`, `/publicdomain/zero/1.0/` to `cc0-1.0`;
  *     other rel=license targets report `other-license-link`.
  *  2. an SPDX identifier comment/text: `SPDX-License-Identifier: X`
  *     reports `spdx:X` (trimmed, case preserved — SPDX ids are
  *     case-sensitive).
  *  3. the plain-text "all rights reserved" phrase (case-insensitive)
  *     reports `all-rights-reserved`.
  *  4. nothing → `none` (never a guess: an absent signal is a fact
  *     the datasheet must carry, not a default license).
  *
  * The rel=license pattern accepts either attribute order and either
  * quote style; CC codes normalize to lowercase (hrefs in the wild
  * mix case), versions keep their digits. */
object Licensing {

  private val relLicenseHref =
    """(?is)<(?:a|link)\b(?=[^>]*\brel=["']license["'])[^>]*""" +
      """\bhref=["']([^"']*)["']"""

  private val ccLicense =
    """(?i)creativecommons\.org/licenses/([a-z-]+)/([0-9.]+)"""

  private val ccZero =
    """(?i)creativecommons\.org/publicdomain/zero/([0-9.]+)"""

  private val spdxId = """SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)"""

  /** The detected license label for an HTML/text column, per the
    * precedence above. */
  def detectLicense(page: Column): Column = {
    val href = regexp_extract(page, relLicenseHref, 1)
    val ccCode = lower(regexp_extract(href, ccLicense, 1))
    val ccVer = regexp_extract(href, ccLicense, 2)
    val cc0Ver = regexp_extract(href, ccZero, 1)
    val spdx = regexp_extract(page, spdxId, 1)
    when(length(href) > 0,
      when(length(ccCode) > 0, concat(lit("cc-"), ccCode, lit("-"), ccVer))
        .when(length(cc0Ver) > 0, concat(lit("cc0-"), cc0Ver))
        .otherwise(lit("other-license-link")))
      .when(length(spdx) > 0, concat(lit("spdx:"), spdx))
      .when(page.rlike("(?i)all rights reserved"),
        lit("all-rights-reserved"))
      .otherwise(lit("none"))
  }

  /** Per-(group, license) datasheet rollup: document counts and the
    * exact integer milli share WITHIN the group (floor division — the
    * repo-wide no-doubles discipline). */
  def licenseMix(df: org.apache.spark.sql.DataFrame, groupCol: String,
                 licenseCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(licenseCol))
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(groupCol)
    counts
      .withColumn("__grp_total", sum("n_docs").over(w))
      .withColumn("share_milli", expr("(1000 * n_docs) div __grp_total"))
      .drop("__grp_total")
  }
}
