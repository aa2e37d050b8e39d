package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.connections.{BigQueryDispositions, ClickhouseLocate, RemoteRank}

/** Pure-logic tests for the external SQL connections, mirroring the
  * reference's mocked-client unit tests (test_clickhouse.py locate rules,
  * test_bigquery.py disposition mapping). */
class ExternalSqlSpec extends AnyFunSuite {

  // --- ClickHouse locate (clickhouse.py:114-143) ---

  test("bare locator + config database → qualified") {
    assert(ClickhouseLocate.locate("events", Some("analytics")) ==
      "\"analytics\".\"events\"")
  }

  test("dotted locator without config database → as given") {
    assert(ClickhouseLocate.locate("analytics.events", None) ==
      "\"analytics\".\"events\"")
  }

  test("dotted locator WITH config database → error") {
    assertThrows[IllegalArgumentException] {
      ClickhouseLocate.locate("analytics.events", Some("other"))
    }
  }

  test("bare locator without config database → error") {
    assertThrows[IllegalArgumentException] {
      ClickhouseLocate.locate("events", None)
    }
  }

  test("three-part locator → error") {
    assertThrows[IllegalArgumentException] {
      ClickhouseLocate.locate("a.b.c", None)
    }
  }

  // --- BigQuery load dispositions (bigquery.py:285-320) ---

  test("data_mode → WriteDisposition") {
    assert(BigQueryDispositions.writeDisposition("append") == "WRITE_APPEND")
    assert(BigQueryDispositions.writeDisposition("overwrite") == "WRITE_TRUNCATE")
    assert(BigQueryDispositions.writeDisposition("error") == "WRITE_EMPTY")
    assert(BigQueryDispositions.writeDisposition("anything") == "WRITE_EMPTY")
  }

  test("schema_mode merge → ALLOW_FIELD_ADDITION; else none") {
    assert(BigQueryDispositions.schemaUpdateOptions("merge") ==
      List("ALLOW_FIELD_ADDITION"))
    assert(BigQueryDispositions.schemaUpdateOptions("overwrite").isEmpty)
  }

  // --- Remote ranked query (util.py:336-383 shape) ---

  test("ranking pushed into the remote query") {
    val q = RemoteRank("SELECT id, v, ts FROM Clickhouse",
      "\"db\".\"t\"", Some("ts"), Seq("id"))
    assert(q.contains("ROW_NUMBER() OVER (PARTITION BY \"id\" ORDER BY \"ts\" DESC) AS __rank__"))
    assert(q.contains("FROM \"db\".\"t\""))
    assert(q.contains("AS ranked WHERE \"__rank__\" = 1"))
  }

  test("no version/keys → plain placeholder swap") {
    val q = RemoteRank("SELECT id FROM Clickhouse WHERE id > 3",
      "\"db\".\"t\"", None, Nil)
    assert(q == "SELECT id FROM \"db\".\"t\" WHERE id > 3")
  }

  // --- Dialect-aware identifier quoting (p18's hive2 loopback leg) ---

  test("hive2 urls rank with backticks, others with ANSI double quotes") {
    import graft.connections.IdQuote
    assert(IdQuote.forUrl("jdbc:hive2://h:1/default")("a b") == "`a b`")
    assert(IdQuote.forUrl("jdbc:derby:/x/db")("a") == "\"a\"")
    assert(IdQuote.forUrl("jdbc:clickhouse://h:8123")("a") == "\"a\"")
    val q = RemoteRank("SELECT id, v, ts FROM Clickhouse",
      "`db`.`t`", Some("ts"), Seq("id"), IdQuote.backtick)
    assert(q.contains("PARTITION BY `id` ORDER BY `ts` DESC"))
    assert(q.contains("WHERE `__rank__` = 1"))
    assert(ClickhouseLocate.locate("global_temp.v", None, IdQuote.backtick) ==
      "`global_temp`.`v`")
  }

  test("embedded quote characters are escaped, not injected") {
    import graft.connections.IdQuote
    assert(IdQuote.doubleQuote("a\"b") == "\"a\"\"b\"")
    assert(IdQuote.backtick("a`b") == "`a``b`")
  }

  test("remote limit clause is dialect-aware (Derby has no LIMIT)") {
    import graft.connections.{ClickhouseConnection, ConnContext, FlowConfig}
    import graft.model.ConnectionDef
    import graft.sqlbridge.SqlBridge
    def conn(url: String) = new ClickhouseConnection(ConnContext(
      SparkSuite.spark,
      ConnectionDef("clickhouse", Some("t"),
        Map("config" -> Map[String, Any]("jdbc_url" -> url, "database" -> "db"))),
      FlowConfig(), scala.collection.mutable.Map.empty,
      new SqlBridge.NameRegistry))
    val derby = conn("jdbc:derby:/x/db")
      .remoteQuery("SELECT a FROM Clickhouse", Some(7))
    assert(derby.endsWith("FETCH FIRST 7 ROWS ONLY"), derby)
    val ch = conn("jdbc:clickhouse://h:8123")
      .remoteQuery("SELECT a FROM Clickhouse", Some(7))
    assert(ch.endsWith("LIMIT 7"), ch)
  }
}
