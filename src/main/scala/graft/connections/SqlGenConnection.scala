package graft.connections

import org.apache.spark.sql.{AnalysisException, DataFrame}
import org.apache.spark.sql.catalyst.parser.ParseException
import graft.sqlbridge.SqlBridge
import graft.template.Renderer

/** LLM text→SQL protocol. The reference defaults to a mock backend
  * (ankaflow/models/llm.py:24); real backends implement this trait. */
trait LlmProtocol {
  /** Given a prompt (and optional error feedback), produce SQL text. */
  def complete(prompt: String): String
}

/** Mock protocol: replays SQL configured on the connection (`mock_sql`
  * param, or a list for successive retries) — mirrors the reference's
  * replay-based mock (sqlgen.py:126-148 / test_llm_connection.py). */
final class MockLlm(responses: List[String]) extends LlmProtocol {
  private var i = -1
  override def complete(prompt: String): String = {
    i = math.min(i + 1, responses.size - 1)
    if (responses.isEmpty) sys.error("MockLlm has no responses configured")
    responses(i)
  }
}

/** SQLGen connection (reference: ankaflow/connections/llm/sqlgen.py:91-193):
  * prompt → LLM → SQL → temp view; on Analysis/Parse errors re-prompt with
  * the error appended, up to 3 retries; write `<name>_success/_fail/_user`
  * into variables. */
final class SqlGenConnection(ctx: ConnContext) extends Connection(ctx) {

  private def protocol: LlmProtocol = conn.str("protocol_class") match {
    case Some(cls) => Class.forName(cls).getDeclaredConstructor()
      .newInstance().asInstanceOf[LlmProtocol]
    case None => new MockLlm(conn.strList("mock_sql"))
  }

  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    val prompt0 = query.getOrElse(sys.error("SQLGen requires a prompt query"))
    val llm = protocol
    val maxRetries = conn.int("max_retries").getOrElse(3)
    var prompt = Renderer.render(prompt0,
      Map("variables" -> ctx.variables, "API" -> graft.template.Api))
    var lastErr: Throwable = null
    var attempt = 0
    while (attempt <= maxRetries) {
      val sql = llm.complete(prompt)
      try {
        val df = spark.sql(SqlBridge.translate(sql, ctx.names, Some(spark)))
        df.schema // force analysis
        ctx.variables.put(s"${varBase}_success", sql)
        return limit.map(df.limit).getOrElse(df)
      } catch {
        case e @ (_: AnalysisException | _: ParseException) =>
          lastErr = e
          prompt = s"$prompt\n-- previous attempt failed: ${e.getMessage}\n"
          attempt += 1
      }
    }
    ctx.variables.put(s"${varBase}_fail", lastErr.getMessage)
    throw lastErr
  }

  private def varBase: String = conn.locator.getOrElse("sqlgen")

  override def sink(from: DataFrame): Unit =
    throw new UnsupportedOperationException("SQLGen does not support sink")
}
