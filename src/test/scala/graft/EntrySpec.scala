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

  test("all 152 declared operators are present") {
    assert(SparkEntry.queries.size == 152) // 21 q + 25 p + 106 t
  }

  test("t15 components: labels are canonical minima consistent with t02 pairs") {
    val sf = "/root/testdata/sf0.001"
    val comp = SparkEntry.queries("t15_dedup_components")(spark, sf)
    val rows = comp.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // every cluster id is the min doc of its component → never above doc
    rows.foreach { case (doc, (cluster, canonical)) =>
      assert(cluster <= doc)
      assert(canonical == (cluster == doc))
      // the cluster representative labels itself
      assert(rows(cluster)._1 == cluster)
    }
    // both endpoints of every candidate pair share a cluster
    SparkEntry.queries("t02_minhash_lsh")(spark, sf).collect().foreach { r =>
      assert(rows(r.getLong(0))._1 == rows(r.getLong(1))._1,
        s"pair ${r.getLong(0)},${r.getLong(1)} split across clusters")
    }
  }

  test("t70 waterfill: allocations exhaust the budget up to integer slack") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("t70_budget_waterfill")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val total = rows.map(_._2).sum
    val budget = total * 6 / 10
    val alloc = rows.map(_._3).sum
    val capped = rows.filter(_._4)
    // never overspends; floor-level slack is < one token per capped source
    assert(alloc <= budget, s"allocated $alloc > budget $budget")
    assert(budget - alloc < math.max(capped.length.toLong, 1),
      "slack must be the integer-floor remainder only")
    // uncapped sources keep everything; capped sources share ONE level
    rows.filterNot(_._4).foreach { case (_, tok, a, _) => assert(a == tok) }
    assert(capped.map(_._3).distinct.length <= 1,
      "waterfill caps every capped source at the same level")
    // the level never exceeds any uncapped source's size (sorted property)
    if (capped.nonEmpty) {
      val lvl = capped.head._3
      rows.filterNot(_._4).foreach { case (_, tok, _, _) =>
        assert(tok <= lvl || rows.count(_._4) == 0)
      }
    }
  }
}
