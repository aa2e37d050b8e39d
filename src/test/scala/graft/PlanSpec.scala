package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: these are the properties that survive a 100×
  * scale-up — filters reaching the parquet scan, broadcast for small
  * dims, map-side partial aggregation, pruned read schemas. A passing
  * value test with a wrong plan is not done (builder prompt). */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filters are pushed to the parquet scan and schema is pruned") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate range filter must reach the scan")
    // projection pruning: scanned schema must not include l_tax
    assert(!p.contains("l_tax"), "unused columns must be pruned from the scan")
  }

  test("q03: customer dimension joins via broadcast") {
    val p = plan("q03_join_topk")
    assert(p.contains("BroadcastHashJoin"), "small dim must broadcast")
  }

  test("q13: nation/region dims broadcast, no cartesian") {
    val p = plan("q13_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q01: aggregation has a map-side partial phase") {
    val p = plan("q01_agg_pricing")
    assert(p.contains("HashAggregate"))
    // partial + final pair ⇒ map-side combine before the shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q04: dedup ranking is a single window, no extra shuffle") {
    val p = plan("q04_dedup_rank")
    assert(p.contains("Window"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "one shuffle for the window partition + one for the final sort at most")
  }

  test("t01: dedup groups by the 16-byte digest, not the document body") {
    val df = SparkEntry.queries("t01_dedup_exact")(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("md5"))
  }

  test("t05: query vector joins via broadcast (no shuffle of embeddings)") {
    val p = plan("t05_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("whole-stage codegen covers the relational hot paths") {
    // AQE finalizes the plan lazily; execute first, then inspect.
    val df = SparkEntry.queries("q01_agg_pricing")(spark, sf)
    df.collect()
    // codegen spans render as "*(n)" markers in the tree string
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), "scan+partial agg must be inside a codegen span")
    assert(p.contains("*(2)"), "final agg must be inside a codegen span")
  }
}
