package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sqlbridge.{RawDispatch, SqlBridge}

/** Mirrors ankaflow/tests/test_connection_rewriter.py:36-101. */
class RawDispatchSpec extends AnyFunSuite {

  test("delta_scan short → long, rest preserved") {
    val out = RawDispatch.rewrite(
      "SELECT * FROM delta_scan('orders') WHERE day > 0",
      "orders", "gs://bucket/a/long/prefix/orders")
    assert(out.contains("delta_scan('gs://bucket/a/long/prefix/orders')"))
    assert(out.contains("WHERE day > 0"))
  }

  test("read_parquet kwargs preserved while swapping locator") {
    val out = RawDispatch.rewrite(
      "SELECT * FROM read_parquet('products/*parquet', union_by_name=true)",
      "products/*parquet", "gs://bucket/landing/products/*.parquet")
    assert(out.contains(
      "read_parquet('gs://bucket/landing/products/*.parquet', union_by_name=true)"))
  }

  test("locator mismatch raises") {
    assertThrows[IllegalArgumentException] {
      RawDispatch.rewrite("SELECT * FROM read_parquet('wrong')",
        "matter", "gs://anything/should/not/matter")
    }
  }

  test("absolute remote path is a no-op") {
    val sql = "SELECT * FROM read_parquet('s3://x/y/z.parquet')"
    assert(RawDispatch.rewrite(sql, "matter", "gs://n/a") == sql)
  }

  test("absolute local path is a no-op") {
    val sql = "SELECT * FROM read_parquet('/mnt/data/file.parquet')"
    assert(RawDispatch.rewrite(sql, "matter", "gs://n/a") == sql)
  }

  test("containment-check failure names both locators") {
    val e = intercept[IllegalArgumentException] {
      RawDispatch.rewrite("SELECT * FROM delta_scan('orders')",
        "customers", "gs://bucket/long/prefix/customers")
    }
    assert(e.getMessage.contains("orders"))
    assert(e.getMessage.contains("customers"))
  }

  test("multiple occurrences are all rewritten") {
    val out = RawDispatch.rewrite(
      """WITH a AS (SELECT * FROM delta_scan('orders')),
        |     b AS (SELECT * FROM delta_scan('orders'))
        |SELECT * FROM a JOIN b USING(id)""".stripMargin,
      "orders", "gs://bucket/prefix/orders")
    assert("delta_scan\\('gs://bucket/prefix/orders'\\)".r
      .findAllIn(out).size == 2)
  }

  test("execute: read_parquet call runs through Spark with full SQL") {
    val spark = SparkSuite.spark
    val df = RawDispatch.execute(spark,
      "SELECT count(*) AS n FROM read_parquet('/root/testdata/sf0.001/region.parquet', union_by_name=true)",
      new SqlBridge.NameRegistry)
    assert(df.collect().head.getLong(0) == 5L)
  }

  test("execute: CTEs and joins allowed (unlike placeholder taps)") {
    val spark = SparkSuite.spark
    val df = RawDispatch.execute(spark,
      """WITH r AS (SELECT * FROM read_parquet('/root/testdata/sf0.001/region.parquet')),
        |     n AS (SELECT * FROM read_parquet('/root/testdata/sf0.001/nation.parquet'))
        |SELECT count(*) AS n FROM r JOIN n ON r.r_regionkey = n.n_regionkey""".stripMargin,
      new SqlBridge.NameRegistry)
    assert(df.collect().head.getLong(0) == 25L)
  }
}
