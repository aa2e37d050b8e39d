package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.Components

/** Pins the connected-components operator: the star-contraction fallback
  * must produce exactly the labels propagation produces, including on a
  * chain fixture whose diameter exceeds the propagation round cap (the
  * case that previously aborted t15). */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def docs(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
  }
  private def pairs(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.toDF("doc_a", "doc_b")
  }
  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain longer than the propagation cap: propagate gives up, star contraction converges") {
    // path 0-1-2-...-39: diameter 39
    val n = 40L
    val d = docs(0L until n)
    val p = pairs((0L until n - 1).map(i => (i, i + 1)))

    assert(Components.propagate(d, p, maxRounds = 5).isEmpty,
      "a 5-round cap cannot close a diameter-39 chain")

    val star = labelMap(Components.starContract(d, p))
    assert(star == (0L until n).map(_ -> 0L).toMap)

    // connected() falls back and returns the same labels
    val conn = labelMap(Components.connected(d, p, propagateRounds = 5))
    assert(conn == star)

    // and the uncapped propagation agrees
    val prop = labelMap(Components.propagate(d, p, maxRounds = 100).get)
    assert(prop == star)
  }

  test("multiple components, isolated nodes, dup/self/reversed edges") {
    val d = docs(0L to 10L)
    val p = pairs(Seq(
      (1L, 2L), (2L, 1L), (2L, 3L),          // component {1,2,3} w/ dup edge
      (5L, 5L),                              // self loop: isolated 5
      (7L, 6L), (8L, 7L), (8L, 6L),          // clique {6,7,8} reversed order
      (9L, 10L)))                            // pair {9,10}
    val expect = Map(
      0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 6L, 8L -> 6L, 9L -> 9L, 10L -> 9L)
    assert(labelMap(Components.starContract(d, p)) == expect)
    assert(labelMap(Components.propagate(d, p, maxRounds = 20).get) == expect)
    assert(labelMap(Components.connected(d, p)) == expect)
  }

  test("random graph: star contraction labels equal propagation labels") {
    val rnd = new scala.util.Random(42)
    val n = 200
    val es = (1 to 150).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }.filter { case (a, b) => a != b }
    val d = docs(0L until n.toLong)
    val p = pairs(es)
    val prop = labelMap(Components.propagate(d, p, maxRounds = 200).get)
    val star = labelMap(Components.starContract(d, p))
    assert(star == prop)
  }

  test("debug guard catches an edge endpoint missing from docs") {
    // the union-min propagation round invents a label row for an unknown
    // endpoint (r21 advice); callers hold the precondition by
    // construction, and this guard (debug-only: it costs an anti-join
    // job per call) is how a future caller that breaks it fails loudly
    System.setProperty("graft.components.checkEndpoints", "true")
    try {
      val d = docs(Seq(0L, 1L, 2L))
      intercept[IllegalArgumentException] {
        Components.propagate(d, pairs(Seq((1L, 7L))), maxRounds = 5)
      }
      // and a contract-respecting input still passes with the guard on
      val ok = labelMap(Components.propagate(
        d, pairs(Seq((1L, 2L))), maxRounds = 5).get)
      assert(ok == Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
    } finally System.clearProperty("graft.components.checkEndpoints")
  }
}
