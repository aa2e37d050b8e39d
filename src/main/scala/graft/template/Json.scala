package graft.template

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node._
import scala.jdk.CollectionConverters._

/** JSON ↔ Scala structures (Map[String,Any] / List[Any] / primitives),
  * backed by jackson-databind (ships in /opt/spark/jars). */
object Json {

  private val mapper = new ObjectMapper()

  def parse(s: String): Any = toScala(mapper.readTree(s))

  def toScala(n: JsonNode): Any = n match {
    case null => null
    case _: NullNode | _: MissingNode => null
    case b: BooleanNode => b.booleanValue
    case t: TextNode => t.textValue
    case num: NumericNode =>
      if (num.isIntegralNumber) num.longValue else num.doubleValue
    case a: ArrayNode => a.elements.asScala.map(toScala).toList
    case o: ObjectNode =>
      o.properties.asScala.map(e => e.getKey -> toScala(e.getValue)).toMap
    case other => other.asText
  }

  def write(v: Any): String = {
    val sb = new StringBuilder
    writeTo(v, sb)
    sb.toString
  }

  private def writeTo(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case b: Boolean => sb.append(if (b) "true" else "false")
    case n: Long => sb.append(n)
    case n: Int => sb.append(n)
    case d: Double =>
      if (d == d.floor && !d.isInfinite && d.abs < 1e15) sb.append(d.toLong)
      else sb.append(d)
    case n: Number => sb.append(n)
    case s: String => quote(s, sb)
    case m: scala.collection.Map[_, _] => // incl. mutable (flow variables)
      sb.append('{')
      var first = true
      m.foreach { case (k, vv) =>
        if (!first) sb.append(',')
        first = false
        quote(String.valueOf(k), sb)
        sb.append(':')
        writeTo(vv, sb)
      }
      sb.append('}')
    case l: Iterable[_] =>
      sb.append('[')
      var first = true
      l.foreach { e =>
        if (!first) sb.append(',')
        first = false
        writeTo(e, sb)
      }
      sb.append(']')
    case other => quote(other.toString, sb)
  }

  private def quote(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
