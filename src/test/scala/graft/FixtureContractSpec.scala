package graft

import org.apache.spark.sql.functions.col
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

  test("event_id is unique per (user_id, event_type) — q04's agg contract") {
    // q04 computes latest-event-per-(user, type) as max(event_id) +
    // max_by(value, event_id) (r21). The pairing is row-consistent only
    // while event_id is unique within each group: with a duplicated max
    // event_id, latest_event_id and latest_value could come from
    // different rows and max_by's pick would be nondeterministic (r21
    // advice). The fixture guarantees it; pin that guarantee so a future
    // fixture regeneration can't silently desync the two aggregates.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val dups = graft.queries.Tables.events(spark, d)
        .groupBy("user_id", "event_type", "event_id").count()
        .filter(col("count") > 1).limit(1).count()
      assert(dups == 0L,
        s"$d/events has a duplicate event_id within a (user_id, " +
          "event_type) group — q04's max/max_by pairing is no longer " +
          "row-consistent; restore the ROW_NUMBER form or fix the fixture")
    }
  }

  test("every fixture table reads with rows at sf0.001") {
    graft.queries.Tables.all.foreach { name =>
      val n = graft.queries.Tables.t(spark, sf, name).count()
      assert(n > 0, s"fixture table $name is empty")
    }
  }

  test("fixture dtypes the engine hard-depends on have not drifted") {
    // the round-10 lesson generalized: the generator regenerates
    // /root/testdata each round and CAN drift a physical type (events.ts
    // did, ns→µs, bricking 8 queries). For the dtypes that engine code
    // assumes structurally — not just reads through — fail HERE with the
    // drifted type named, instead of as a pile of analysis errors deep
    // inside the gate. events.ts is excluded: Tables.events adapts and
    // the test above pins its adapted type.
    import org.apache.spark.sql.types._
    val want: Seq[(String, String, DataType)] = Seq(
      // float_dot / minhash8 / quantize assume 32-bit embeddings; a
      // silent float→double drift would poison every cosine against the
      // oracle rather than fail loudly
      ("embeddings", "embedding", ArrayType(FloatType, containsNull = true)),
      ("embeddings", "vec_id", LongType),
      ("embeddings", "label", IntegerType),
      // shingling/quality/packing assume string text + long counts
      ("documents", "doc_id", LongType),
      ("documents", "text", StringType),
      ("documents", "n_chars", LongType),
      ("events", "event_id", LongType),
      ("events", "user_id", LongType),
      ("events", "value", DoubleType),
      ("lineitem", "l_quantity", DoubleType),
      ("orders", "o_totalprice", DoubleType))
    val drifted = want.flatMap { case (table, column, expected) =>
      val actual = graft.queries.Tables.t(spark, sf, table).schema(column).dataType
      if (actual == expected) None
      else Some(s"$table.$column drifted: expected $expected, read $actual")
    }
    assert(drifted.isEmpty,
      drifted.mkString("", "\n", "\n— adapt the reader (like Tables.events) " +
        "or update the engine's assumptions AND this contract together"))
  }

  test("parquetRowCount skips hidden paths, matching Spark's reader view") {
    // r16 ADVICE: a leftover _temporary dir from an interrupted write is
    // invisible to Spark's InMemoryFileIndex but used to be summed by the
    // footer count — silently shifting t26's kCells vs the DuckDB oracle.
    val dir = java.nio.file.Files.createTempDirectory("rowcount").toString
    try {
      import spark.implicits._
      (1L to 500L).toDF("id").repartition(2).write.parquet(s"$dir/tbl")
      val parts = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/tbl"))
        .filter(_.toString.endsWith(".parquet")).toArray.map(_.toString)
      assert(parts.nonEmpty)
      // plant copies under _temporary and .stage — Spark ignores both
      for (h <- Seq("_temporary/0", ".stage")) {
        val hd = java.nio.file.Paths.get(s"$dir/tbl/$h")
        java.nio.file.Files.createDirectories(hd)
        java.nio.file.Files.copy(java.nio.file.Paths.get(parts.head),
          hd.resolve("leftover.parquet"))
      }
      val footerN = graft.queries.Tables.parquetRowCount(spark, s"$dir/tbl")
      val sparkN = spark.read.parquet(s"$dir/tbl").count()
      assert(sparkN == 500L)
      assert(footerN.contains(sparkN),
        s"footer count $footerN must equal Spark's reader view $sparkN")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
