package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Count-drift guard INSIDE the test suite (the r7 verdict's ask): the
  * numbers README.md and the verify skill advertise must equal the
  * COMPILED contract — `SparkEntry.queries.size` / `oracleSql.size` —
  * so drift fails `sbt test` instead of relying on someone remembering
  * to run `tools/check_counts.py` (which remains the no-JVM quick
  * check; its scan is scoped to the registration map bodies since r8 —
  * the ADVICE-r7 driftability note). */
class ContractCountsSpec extends AnyFunSuite {

  private val total = SparkEntry.queries.size
  private val checked = SparkEntry.oracleSql.size

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  test("every oracle entry names a registered query; rows-only set is " +
      "exactly the two native sketches") {
    val extra = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(extra.isEmpty, s"oracle entries with no query: $extra")
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly === Set("a01_hll_distinct", "a02_percentiles"),
      "a new query landed without its DuckDB oracle (rows-only is a " +
        s"deliberate, closed set): $rowsOnly")
  }

  test("README.md advertises the compiled contract's counts") {
    val m = """(\d+) of the (\d+) queries""".r.findFirstMatchIn(read("README.md"))
    assert(m.nonEmpty, "README.md: 'N of the M queries' line missing")
    assert((m.get.group(1).toInt, m.get.group(2).toInt) === ((checked, total)),
      s"README says ${m.get.group(1)}/${m.get.group(2)}, compiled " +
        s"contract is $checked/$total")
  }

  test("MIGRATION.md advertises the compiled contract's query count") {
    val m = """`SparkEntry.queries` \((\d+) queries""".r
      .findFirstMatchIn(read("MIGRATION.md"))
    assert(m.nonEmpty, "MIGRATION.md: '(N queries' line missing")
    assert(m.get.group(1).toInt === total,
      s"MIGRATION.md says ${m.get.group(1)}, compiled contract is $total")
  }

  test("verify SKILL.md expects the compiled contract's pass count") {
    val p = Paths.get(".claude/skills/verify/SKILL.md")
    assume(Files.exists(p), "no verify skill in this checkout")
    val m = """Expect `(\d+) pass""".r.findFirstMatchIn(read(p.toString))
    assert(m.nonEmpty, "SKILL.md: 'Expect `N pass' line missing")
    assert(m.get.group(1).toInt === checked,
      s"SKILL.md expects ${m.get.group(1)} passes, compiled contract " +
        s"is $checked")
  }
}
