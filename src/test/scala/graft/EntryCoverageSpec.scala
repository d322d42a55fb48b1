package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract symmetry the SparkEntry docstring claims:
  * EVERY query entry has a full DuckDB oracle (no entry escapes to the
  * weaker rows-only check), and no oracle is orphaned. */
class EntryCoverageSpec extends AnyFunSuite {
  test("queries and oracleSql carry identical key sets") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"entries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without an entry: ${(o -- q).toSeq.sorted}")
  }
}
