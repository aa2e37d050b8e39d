package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.connections.{ConnContext, Connection, FlowConfig}
import graft.core.Flow

/** User-plugin connection loaded by class name (reference:
  * CustomConnection, ankaflow/models/connections.py:236-275, loader
  * ankaflow/connections/__init__.py:54-63). */
class DemoCustomConnection(ctx: ConnContext) extends Connection(ctx) {
  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    val s = spark
    import s.implicits._
    val n = conn.int("rows").getOrElse(3)
    finishTap((1 to n).map(i => (i, s"row$i")).toDF("id", "label"), query, limit)
  }
  override def sink(from: DataFrame): Unit =
    ctx.variables.put("custom_sink_count", from.count())
}

class CustomConnectionSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("custom connection taps and sinks through the flow") {
    val vars = scala.collection.mutable.Map[String, Any]()
    val yaml =
      """
        |- name: FromPlugin
        |  kind: tap
        |  connection:
        |    kind: CustomConnection
        |    module: graft.DemoCustomConnection
        |    rows: 4
        |- name: Doubled
        |  kind: transform
        |  query: select id * 2 as id2, label from FromPlugin
        |- name: ToPlugin
        |  kind: sink
        |  connection:
        |    kind: CustomConnection
        |    module: graft.DemoCustomConnection
        |""".stripMargin
    val flow = new Flow(spark, graft.model.Stages.load(yaml),
      Map.empty, FlowConfig(), vars).run()
    assert(flow.df().count() == 4)
    assert(vars("custom_sink_count") == 4L)
  }
}
