package graft.template

import scala.collection.mutable

/** Minimal template engine covering the reference's rendering surface
  * (ankaflow/common/renderer.py + api.py; SURVEY.md §2.7):
  *
  *  - expression delimiters `<< expr >>`, statement delimiters
  *    `<% for/if/else/endfor/endif %>`, comments `<# ... #>`;
  *  - dotted attribute / `[n]` index access over maps, lists, and the
  *    render context (`context`, `variables`, `API`);
  *  - binary ops (== != < <= > >= + - * / %), and/or/not, literals;
  *  - filters `|bool |int |float |str |tojson |upper |lower`;
  *  - `loop.last` / `loop.index` / `loop.index0` inside for-blocks;
  *  - typed result inference: a render that yields "true"/"false"/"null"
  *    or a numeric string becomes the typed value (renderer.py:56-71);
  *  - `@json` prefix: render, then JSON-parse the result (renderer.py:75-99).
  *
  * Sandboxing is by construction — this interpreter has no attribute
  * reflection and can only touch the values placed in its context
  * (reference needs SandboxedEnvironment; see security.py).
  */
object Renderer {

  /** Render to a string. */
  def render(template: String, ctx: Map[String, Any]): String = {
    val nodes = TemplateParser.parse(template)
    val sb = new StringBuilder
    exec(nodes, ctx, sb)
    sb.toString
  }

  /** Render with type inference + `@json` handling. Returns typed value. */
  def renderTyped(template: String, ctx: Map[String, Any]): Any = {
    val (tpl, jsonMode) =
      if (template.startsWith("@json")) (template.drop(5), true)
      else if (template.startsWith("JSON>")) (template.drop(5), true)
      else (template, false)
    val out = render(tpl, ctx).trim
    if (jsonMode) Json.parse(out)
    else inferType(out)
  }

  /** "true"/"false"/"null"/int/float strings → typed values. Matches the
    * reference (renderer.py:56-71): case-insensitive true/false/null/none
    * (it lowercases first) and Python float() acceptance, which includes
    * exponent literals without a decimal point ("1e5"). */
  def inferType(s: String): Any = s.toLowerCase match {
    case "true" => true
    case "false" => false
    case "null" | "none" => null
    case _ =>
      if (s.nonEmpty && s.matches("-?\\d+")) {
        try s.toLong.asInstanceOf[Any] catch { case _: Exception => s }
      } else if (s.nonEmpty &&
          s.matches("-?\\d+(\\.\\d+)?([eE][-+]?\\d+)?") && (
            s.contains('.') || s.contains('e') || s.contains('E')))
        s.toDouble
      else s
  }

  /** Reference truthiness for skip_if (ankaflow/common/util.py:169-188):
    * 'false','0','0.0','none','','[]','{}','()' → false, else true. */
  def stringToBool(v: Any): Boolean = v match {
    case ExprEval.Undefined => false
    case null => false
    case b: Boolean => b
    case n: Long => n != 0
    case n: Int => n != 0
    case d: Double => d != 0.0
    case s: String =>
      !Set("false", "0", "0.0", "none", "", "[]", "{}", "()")
        .contains(s.trim.toLowerCase)
    case l: Seq[_] => l.nonEmpty
    case m: scala.collection.Map[_, _] => m.nonEmpty
    case _ => true
  }

  // ---------------------------------------------------------------- exec

  private def exec(nodes: List[Node], ctx: Map[String, Any], sb: StringBuilder): Unit =
    nodes.foreach {
      case Text(t) => sb.append(t)
      case Expr(e) => sb.append(Stringify(ExprEval.eval(e, ctx)))
      case If(branches, orElse) =>
        branches.find { case (cond, _) =>
          stringToBool(ExprEval.eval(cond, ctx))
        } match {
          case Some((_, body)) => exec(body, ctx, sb)
          case None => exec(orElse, ctx, sb)
        }
      case For(varName, iterExpr, body) =>
        val it = ExprEval.eval(iterExpr, ctx) match {
          case l: Seq[_] => l
          case m: scala.collection.Map[_, _] => m.keys.toSeq
          case null => Nil
          case other => Seq(other)
        }
        it.zipWithIndex.foreach { case (item, i) =>
          val loopCtx = ctx +
            (varName -> item) +
            ("loop" -> Map(
              "index" -> (i + 1).toLong, "index0" -> i.toLong,
              "first" -> (i == 0), "last" -> (i == it.size - 1)))
          exec(body, loopCtx, sb)
        }
    }

  object Stringify {
    def apply(v: Any): String = v match {
      case ExprEval.Undefined => "" // Jinja Undefined renders empty
      case null => "null"
      case true => "true"
      case false => "false"
      case d: Double => if (d == d.floor && !d.isInfinite && d.abs < 1e15)
        d.toLong.toString else d.toString
      case s: Seq[_] => Json.write(s)
      case m: scala.collection.Map[_, _] => Json.write(m)
      case other => other.toString
    }
  }

  // ---------------------------------------------------------------- AST

  sealed trait Node
  final case class Text(t: String) extends Node
  final case class Expr(e: String) extends Node
  final case class If(branches: List[(String, List[Node])], orElse: List[Node]) extends Node
  final case class For(varName: String, iter: String, body: List[Node]) extends Node

  private object TemplateParser {
    // (?s): tokens may span lines (YAML block scalars wrap freely). Same
    // tradeoff as the reference's Jinja with << >> delimiters: SQL
    // bit-shift operators would be read as template delimiters there too.
    private val token = "(?s)(<<.*?>>|<%.*?%>|<#.*?#>)".r

    def parse(tpl: String): List[Node] = {
      // split into literal text and << >> / <% %> / <# #> tokens
      val parts = mutable.ListBuffer[String]()
      var last = 0
      for (m <- token.findAllMatchIn(tpl)) {
        if (m.start > last) parts += tpl.substring(last, m.start)
        parts += m.matched
        last = m.end
      }
      if (last < tpl.length) parts += tpl.substring(last)
      val (nodes, rest) = parseBlock(parts.toList, Nil)
      if (rest.nonEmpty) sys.error(s"unbalanced template blocks near: ${rest.head}")
      nodes
    }

    /** Parse until an end-token in `stops`; returns (nodes, remaining). */
    private def parseBlock(parts: List[String], stops: List[String])
        : (List[Node], List[String]) = {
      val nodes = mutable.ListBuffer[Node]()
      var rest = parts
      while (rest.nonEmpty) {
        val p = rest.head
        if (p.startsWith("<%")) {
          val stmt = p.stripPrefix("<%").stripSuffix("%>").trim
          val word = stmt.takeWhile(!_.isWhitespace)
          if (stops.contains(word)) return (nodes.toList, rest)
          word match {
            case "for" =>
              // for x in expr
              val m = "for\\s+(\\w+)\\s+in\\s+(.+)".r.findFirstMatchIn(stmt)
                .getOrElse(sys.error(s"bad for: $stmt"))
              val (body, r2) = parseBlock(rest.tail, List("endfor"))
              nodes += For(m.group(1), m.group(2), body)
              rest = r2.drop(1) // consume endfor
            case "if" =>
              val branches = mutable.ListBuffer[(String, List[Node])]()
              var orElse: List[Node] = Nil
              var cond = stmt.stripPrefix("if").trim
              var cur = rest.tail
              var done = false
              while (!done) {
                val (body, r2) = parseBlock(cur, List("elif", "else", "endif"))
                val stop = r2.headOption.map(
                  _.stripPrefix("<%").stripSuffix("%>").trim).getOrElse("endif")
                branches += ((cond, body))
                if (stop.startsWith("elif")) {
                  cond = stop.stripPrefix("elif").trim
                  cur = r2.tail
                } else if (stop == "else") {
                  val (eBody, r3) = parseBlock(r2.tail, List("endif"))
                  orElse = eBody
                  cur = r3.drop(1)
                  done = true
                } else { // endif
                  cur = r2.drop(1)
                  done = true
                }
              }
              nodes += If(branches.toList, orElse)
              rest = cur
            case "set" =>
              sys.error("'set' statements are not supported; use API.setvariable")
            case other => sys.error(s"unsupported statement: $other")
          }
        } else if (p.startsWith("<<")) {
          nodes += Expr(p.stripPrefix("<<").stripSuffix(">>").trim)
          rest = rest.tail
        } else if (p.startsWith("<#")) {
          rest = rest.tail // comment
        } else {
          nodes += Text(p)
          rest = rest.tail
        }
      }
      (nodes.toList, rest)
    }
  }
}
