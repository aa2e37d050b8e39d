package graft

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Flow

/** Full-pipeline integration test shaped like the reference's
  * ankaflow/tests/itest_integration.py + support/integration.yaml:
  * seed data to parquet/csv/json, REST tap with simulated 429 +
  * pagination, file taps, transform counts, a 4-way UNION ALL, the delta
  * round trip, and flow-level show_schema. */
class IntegrationSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("integration: seed files + REST + union + delta + show_schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_itest").toString
    // seed: 5-row frame in three formats (itest_integration.py:20-40)
    val seed = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"))
      .toDF("id", "name")
    seed.write.parquet(s"$dir/seed_parquet")
    seed.write.option("header", "true").csv(s"$dir/seed_csv")
    seed.write.json(s"$dir/seed_json")

    // REST server: first call 429s, then pages of 2 (integration.yaml REST
    // section + support/rest_server.py throttle simulation)
    val calls = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/rows", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val page = "page=(\\d+)".r.findFirstMatchIn(q).map(_.group(1).toInt).getOrElse(0)
      val (code, body) =
        if (calls.incrementAndGet() == 1) (429, """{"err":"throttled"}""")
        else if (page < 2) (200, s"""{"rows":[{"id":${page * 2 + 1},"name":"r"},{"id":${page * 2 + 2},"name":"r"}]}""")
        else (200, """{"rows":[{"id":9,"name":"r"}]}""")
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val port = server.getAddress.getPort

    try {
      val yaml =
        s"""
           |- name: TestParquetRead
           |  kind: tap
           |  connection:
           |    kind: Parquet
           |    locator: $dir/seed_parquet
           |- name: TestCsvRead
           |  kind: tap
           |  connection:
           |    kind: CSV
           |    locator: $dir/seed_csv
           |- name: TestJsonRead
           |  kind: tap
           |  connection:
           |    kind: JSON
           |    locator: $dir/seed_json
           |    format: lines
           |- name: RestRead
           |  kind: tap
           |  connection:
           |    kind: Rest
           |    client:
           |      base_url: http://localhost:$port
           |    request:
           |      endpoint: /rows
           |      method: get
           |      query:
           |        page: 0
           |      response:
           |        locator: rows
           |        handler:
           |          kind: Pagination
           |          page_param: page
           |          page_size: 2
           |          increment: 1
           |- name: Totals
           |  kind: transform
           |  query: select count(*) as totals from TestParquetRead
           |- name: Union All
           |  kind: transform
           |  query: >
           |    select id, name from TestParquetRead
           |    union all select id, name from TestCsvRead
           |    union all select id, name from TestJsonRead
           |    union all select id, name from RestRead
           |- name: Write Delta
           |  kind: sink
           |  connection:
           |    kind: Deltatable
           |    locator: $dir/delta_out
           |    data_mode: overwrite
           |- name: Read Delta
           |  kind: tap
           |  connection:
           |    kind: Deltatable
           |    locator: $dir/delta_out
           |  query: select * from Deltatable
           |- name: Truncate Delta
           |  kind: sql
           |  connection:
           |    kind: Deltatable
           |    locator: $dir/delta_out
           |  query: TRUNCATE DELTATABLE
           |- name: Read Empty Delta
           |  kind: tap
           |  connection:
           |    kind: Deltatable
           |    locator: $dir/delta_out
           |  query: select * from Deltatable
           |""".stripMargin

      val flow = Flow.runYaml(spark, yaml)

      // quoted stage names with spaces resolve through the name registry
      val union = spark.table(flow.names.get("Union All").get)
      assert(union.count() == 20) // 5 parquet + 5 csv + 5 json + 5 REST (2+2+1)
      assert(spark.table(flow.names.get("Read Delta").get).count() == 20)
      // truncate keeps schema, empties data
      assert(flow.df().count() == 0)
      assert(flow.df().schema.fieldNames.sorted.toSeq == Seq("id", "name"))
      // the 429 throttle was actually exercised
      assert(calls.get() >= 4)

      // show_schema without executing (new Flow on the same defs)
      val schemaFlow = new Flow(spark, graft.model.Stages.load(yaml))
      val items = schemaFlow.showSchema()
      val byName = items.map(i => i.table -> i).toMap
      assert(byName("TestParquetRead").fields.fieldNames.sorted.toSeq ==
        Seq("id", "name"))
      assert(byName("TestParquetRead").kind == "Parquet")
      assert(byName.contains("RestRead"))
    } finally server.stop(0)
  }

  test("raw_dispatch tap through YAML: short locator resolved + full SQL") {
    val yaml =
      s"""
         |- name: RawOrders
         |  kind: tap
         |  connection:
         |    kind: Parquet
         |    locator: orders.parquet
         |    raw_dispatch: true
         |  query: >
         |    select o_orderpriority, count(*) as n
         |    from read_parquet('orders.parquet', union_by_name=true)
         |    group by 1
         |""".stripMargin
    val flow = Flow.runYaml(spark, yaml,
      config = graft.connections.FlowConfig(
        bucket = Some("/root/testdata"), dataPrefix = Some("sf0.001")))
    assert(flow.df().count() == 5)
  }
}
