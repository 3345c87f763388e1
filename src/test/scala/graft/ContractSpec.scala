package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract shape guards: the gate's value rests on EVERY query
  * having a DuckDB mirror — a `queries` entry without an `oracleSql`
  * twin silently downgrades to a rows-only check, and an orphan oracle
  * is dead text. No SparkSession needed; this is pure map algebra.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val unoracled = q -- o
    val orphaned = o -- q
    assert(unoracled.isEmpty, s"queries without oracles: ${unoracled.toSeq.sorted.mkString(", ")}")
    assert(orphaned.isEmpty, s"oracles without queries: ${orphaned.toSeq.sorted.mkString(", ")}")
  }

  test("query names are stable lower_snake identifiers") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z][a-z0-9_]*"))
    assert(bad.isEmpty, bad.mkString(", "))
  }
}
