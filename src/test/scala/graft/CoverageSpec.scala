package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SURVEY §2 coverage map must stay in lockstep with the query registry:
  * a component citing a renamed/removed gate would silently report phantom
  * coverage, and a new gate outside the map would be invisible to the
  * per-component self-report.
  */
class CoverageSpec extends AnyFunSuite {

  test("every coverage entry names an existing query") {
    val keys = SparkEntry.queries.keySet
    val missing = Coverage.components.toSeq.flatMap { case (comp, gates) =>
      gates.filterNot(keys.contains).map(g => s"$comp -> $g")
    }
    assert(missing.isEmpty, s"coverage map cites unknown queries:\n${missing.mkString("\n")}")
  }

  test("every query is covered by at least one component") {
    val mapped = Coverage.components.values.flatten.toSet
    val orphans = SparkEntry.queries.keySet.diff(mapped)
    assert(orphans.isEmpty, s"queries missing from the coverage map: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("the §2 enumeration is complete (43 components + CLI + conformance)") {
    val numbered = Coverage.components.keys.count(_.matches("\\d\\d .*"))
    assert(numbered == 45, s"expected the 43 SURVEY components + CLI + conformance rows, got $numbered")
  }
}
