package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself (SparkEntry): entry smoke, key/oracle
  * alignment, name hygiene. */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("entry returns rows at sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
  }

  test("query names are stable identifiers") {
    SparkEntry.queries.keys.foreach(k =>
      assert(k.matches("[a-z][a-z0-9_]+"), s"bad query name: $k"))
  }

  test("all 44 declared operators are present") {
    assert(SparkEntry.queries.size == 44)
  }
}
