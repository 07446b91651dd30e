package graft

import graft.queries.Registry

/** Pins the front-door docs to the ACTUAL registry — the stale-count
  * defect class shipped twice this round (README said 219 and then
  * 228 while HEAD registered more); now it fails the suite instead of
  * waiting for a reviewer. */
class RegistryDocSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def readme: String = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")

  test("README's registered-query count equals Registry.all.size") {
    val m = """(\d+) registered queries \((\d+) DuckDB-oracle-checked"""
      .r.findFirstMatchIn(readme)
      .getOrElse(fail("README no longer carries the registry count line"))
    assert(m.group(1).toInt == Registry.all.size,
      s"README says ${m.group(1)} queries, registry has " +
        s"${Registry.all.size} — update README.md")
    assert(m.group(2).toInt == Registry.oracleSql.size,
      s"README says ${m.group(2)} oracle-checked, registry has " +
        s"${Registry.oracleSql.size} — update README.md")
  }

  test("every registered query has a unique name and every oracle " +
      "references a registered query") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate gate names: ${names.diff(names.distinct).distinct}")
    val missing = Registry.oracleSql.keySet.diff(names.toSet)
    assert(missing.isEmpty, s"oracles without gates: $missing")
  }
}
