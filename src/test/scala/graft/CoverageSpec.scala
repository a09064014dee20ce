package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins COVERAGE.md's totals line to the actual `SparkEntry` maps so the
  * document cannot silently go stale again (round-3 verdict finding #2:
  * the totals block lagged the code by two rounds).
  */
class CoverageSpec extends AnyFunSuite {

  test("COVERAGE.md totals match SparkEntry.queries / oracleSql") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")))
    val m = """Totals: (\d+) queries in `SparkEntry.queries`, (\d+) with DuckDB\s+oracles"""
      .r.findFirstMatchIn(text)
      .getOrElse(fail("COVERAGE.md totals line not found / reformatted"))
    assert(m.group(1).toInt === SparkEntry.queries.size,
      "COVERAGE.md query total is stale")
    assert(m.group(2).toInt === SparkEntry.oracleSql.size,
      "COVERAGE.md oracle total is stale")
  }

  test("every oracle key is a query key (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every oracle-less query has a written rationale in COVERAGE.md") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")))
    val section = text.indexOf("## Why the 21 oracle-less queries cannot have a hash oracle")
    assert(section >= 0, "COVERAGE.md no-oracle rationale section missing")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val missing = noOracle.filterNot(q => text.indexOf(q, section) > section)
    assert(missing.isEmpty,
      s"oracle-less queries without a rationale in COVERAGE.md: $missing")
    // the section header hard-codes the count; keep it honest too
    assert(noOracle.size === 21,
      s"no-oracle count changed (${noOracle.size}) — update the COVERAGE.md section header")
  }
}
