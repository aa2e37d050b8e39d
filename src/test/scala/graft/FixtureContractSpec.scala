package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary. The driver regenerates /root/testdata each round
  * and the physical type of events.ts has already drifted once
  * (TIMESTAMP(NANOS) → timestamp[us]); this spec fails loudly — naming
  * the dtype it saw — on any future unhandled drift, instead of letting
  * eight queries silently drop out of the correctness gate. */
class FixtureContractSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  test("events reader adapts to the fixture's physical ts type") {
    val physical = {
      graft.queries.Tables.ensureEventsReadable(spark)
      spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    }
    val df = graft.queries.Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts must surface as TIMESTAMP regardless of the physical " +
        s"parquet type (saw physical=$physical)")
    val stats = df.selectExpr(
      "count(*) AS n", "count(ts) AS nts",
      "min(ts) AS lo", "max(ts) AS hi").head()
    assert(stats.getLong(0) > 0, "events fixture is empty")
    assert(stats.getLong(1) == stats.getLong(0),
      s"ts has nulls after adaptation (physical=$physical)")
    // sanity-range the values: a unit mix-up (ns read as µs, µs as ms …)
    // lands millennia away from the fixture's 2020s event times
    val lo = stats.getTimestamp(2).toInstant
    val hi = stats.getTimestamp(3).toInstant
    val min = java.time.Instant.parse("2000-01-01T00:00:00Z")
    val max = java.time.Instant.parse("2100-01-01T00:00:00Z")
    assert(!lo.isBefore(min) && !hi.isAfter(max),
      s"events.ts range [$lo, $hi] implausible — unit mix-up for " +
        s"physical type $physical?")
  }

  test("every fixture table reads with rows at sf0.001") {
    graft.queries.Tables.all.foreach { name =>
      val n = graft.queries.Tables.t(spark, sf, name).count()
      assert(n > 0, s"fixture table $name is empty")
    }
  }
}
