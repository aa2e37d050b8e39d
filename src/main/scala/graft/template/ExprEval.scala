package graft.template

/** Expression evaluator for the template language.
  *
  * Grammar (precedence low → high):
  *   or_expr   := and_expr ("or" and_expr)*
  *   and_expr  := not_expr ("and" not_expr)*
  *   not_expr  := "not" not_expr | cmp
  *   cmp       := add (("=="|"!="|"<="|">="|"<"|">"|"in") add)?
  *   add       := mul (("+"|"-") mul)*
  *   mul       := postfix (("*"|"/"|"%") postfix)*
  *   postfix   := primary (("." ident) | "[" expr "]" | call-args | "|" filter)*
  *   primary   := literal | ident | "(" expr ")" | "[" list "]"
  */
object ExprEval {

  /** Jinja's Undefined: renders as the empty string (unlike null, which
    * prints as a literal) — produced by the dunder gate. */
  private[template] case object Undefined

  def eval(src: String, ctx: Map[String, Any]): Any = {
    val p = new Parser(src, ctx)
    val v = p.parseOr()
    p.requireConsumed()
    v
  }

  private final class Parser(src: String, ctx: Map[String, Any]) {
    private var pos = 0
    // quiet mode: the RHS of a short-circuited and/or is parsed (tokens
    // must be consumed) but not effectfully evaluated — no API calls, no
    // arithmetic errors, undefined names read as null (Jinja semantics).
    private var quiet = false

    def requireConsumed(): Unit = {
      ws()
      if (pos < src.length)
        sys.error(s"trailing input at $pos ('${src.substring(pos)}') in: $src")
    }

    private def ws(): Unit = while (pos < src.length && src(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < src.length) src(pos) else '\u0000'
    private def startsWith(s: String): Boolean = src.startsWith(s, pos)
    private def word(): String = {
      val start = pos
      while (pos < src.length && (src(pos).isLetterOrDigit || src(pos) == '_')) pos += 1
      src.substring(start, pos)
    }
    private def expect(c: Char): Unit = {
      ws()
      if (peek != c) sys.error(s"expected '$c' at $pos in: $src")
      pos += 1
    }

    def parseOr(): Any = {
      var v = parseAnd()
      ws()
      while (keyword("or")) {
        val lBool = Renderer.stringToBool(v)
        val prev = quiet
        if (lBool) quiet = true // short-circuit: RHS is parsed, not run
        val r = try parseAnd() finally quiet = prev
        // Jinja returns the winning OPERAND, not a coerced Boolean:
        // << x or 'default' >> renders 'default' when x is falsy.
        v = if (lBool) v else r
        ws()
      }
      v
    }

    private def keyword(kw: String): Boolean = {
      ws()
      if (src.startsWith(kw, pos) &&
          (pos + kw.length >= src.length ||
            !(src(pos + kw.length).isLetterOrDigit || src(pos + kw.length) == '_'))) {
        pos += kw.length; true
      } else false
    }

    private def parseAnd(): Any = {
      var v = parseNot()
      ws()
      while (keyword("and")) {
        val lBool = Renderer.stringToBool(v)
        val prev = quiet
        if (!lBool) quiet = true // short-circuit: RHS is parsed, not run
        val r = try parseNot() finally quiet = prev
        // operand-valued like Jinja: falsy left wins, else the right value
        v = if (lBool) r else v
        ws()
      }
      v
    }

    private def parseNot(): Any = {
      if (keyword("not")) !Renderer.stringToBool(parseNot())
      else parseCmp()
    }

    private def parseCmp(): Any = {
      val l = parseAdd()
      ws()
      val op =
        if (startsWith("==")) { pos += 2; "==" }
        else if (startsWith("!=")) { pos += 2; "!=" }
        else if (startsWith("<=")) { pos += 2; "<=" }
        else if (startsWith(">=")) { pos += 2; ">=" }
        else if (peek == '<') { pos += 1; "<" }
        else if (peek == '>') { pos += 1; ">" }
        else if (keyword("in")) "in"
        else return l
      val r = parseAdd()
      op match {
        case "==" => looseEq(l, r)
        case "!=" => !looseEq(l, r)
        case "in" => r match {
          case s: Seq[_] => s.exists(looseEq(_, l))
          case m: Map[_, _] => m.asInstanceOf[Map[Any, _]].keys.exists(looseEq(_, l))
          case s: String => s.contains(String.valueOf(l))
          case _ => false
        }
        case _ =>
          val c = compare(l, r)
          op match {
            case "<" => c < 0
            case ">" => c > 0
            case "<=" => c <= 0
            case ">=" => c >= 0
          }
      }
    }

    private def parseAdd(): Any = {
      var v = parseMul()
      ws()
      while (peek == '+' || (peek == '-' && !startsWith("->"))) {
        val op = peek; pos += 1
        val r = parseMul()
        v = safeArith(v, r, op)
        ws()
      }
      v
    }

    private def safeArith(a: Any, b: Any, op: Char): Any =
      try arith(a, b, op)
      catch { case e: Exception => if (quiet) null else throw e }

    private def parseMul(): Any = {
      var v = parsePostfix()
      ws()
      while (peek == '*' || peek == '/' || peek == '%') {
        val op = peek; pos += 1
        val r = parsePostfix()
        v = safeArith(v, r, op)
        ws()
      }
      v
    }

    private def parsePostfix(): Any = {
      var v = parsePrimary()
      var continue = true
      while (continue) {
        ws()
        if (peek == '.') {
          pos += 1; ws()
          val name = word()
          ws()
          if (peek == '(') {
            // method call: the API helper object, plus Jinja's
            // dict.get(key[, default]) — anything else is an error,
            // never a silent dispatch to a global helper of that name
            val args = parseArgs()
            v = v match {
              case Api => if (quiet) null else Api.invoke(name, args)
              case m: scala.collection.Map[_, _] if name == "get" =>
                if (args.isEmpty)
                  sys.error(s".get() needs a key argument in: $src")
                val map = m.asInstanceOf[scala.collection.Map[Any, Any]]
                // context maps are string-keyed (YAML keys stringify in
                // Stages.toScala), so a literal Long key like d.get(1)
                // must fall back to its string form to match. The
                // fallback is one-directional — a divergence from the
                // Python reference documented in TemplateSpec's dict.get
                // test (d.get('1') finds a YAML-int key here; the
                // reference would return the default)
                map.get(args.head)
                  .orElse(map.get(String.valueOf(args.head))) match {
                    case Some(found) => found
                    case None => args.lift(1).orNull
                  }
              case other =>
                if (quiet) null
                else sys.error(s"cannot call method '$name' on $other in: $src")
            }
          } else v = access(v, name)
        } else if (peek == '[') {
          pos += 1
          val idx = parseOr()
          expect(']')
          v = index(v, idx)
        } else if (peek == '(') {
          v = call(v, "", parseArgs())
        } else if (peek == '|') {
          pos += 1; ws()
          val f = word()
          v = Filters(f, v)
        } else continue = false
      }
      v
    }

    private def parseArgs(): List[Any] = {
      expect('(')
      val args = scala.collection.mutable.ListBuffer[Any]()
      ws()
      if (peek == ')') { pos += 1; return args.toList }
      var done = false
      while (!done) {
        args += parseOr()
        ws()
        if (peek == ',') pos += 1
        else { expect(')'); done = true }
      }
      args.toList
    }

    private def parsePrimary(): Any = {
      ws()
      peek match {
        case '\'' | '"' =>
          val quote = peek; pos += 1
          val sb = new StringBuilder
          while (pos < src.length && src(pos) != quote) {
            if (src(pos) == '\\' && pos + 1 < src.length) { sb.append(src(pos + 1)); pos += 2 }
            else { sb.append(src(pos)); pos += 1 }
          }
          pos += 1
          sb.toString
        case c if c.isDigit || (c == '-' && pos + 1 < src.length && src(pos + 1).isDigit) =>
          val start = pos
          if (peek == '-') pos += 1
          while (pos < src.length && (src(pos).isDigit || src(pos) == '.')) pos += 1
          val s = src.substring(start, pos)
          if (s.contains('.')) s.toDouble else s.toLong
        case '(' =>
          pos += 1
          val v = parseOr()
          expect(')')
          v
        case '[' =>
          pos += 1
          val items = scala.collection.mutable.ListBuffer[Any]()
          ws()
          if (peek == ']') { pos += 1; return items.toList }
          var done = false
          while (!done) {
            items += parseOr()
            ws()
            if (peek == ',') pos += 1 else { expect(']'); done = true }
          }
          items.toList
        case c if c.isLetter || c == '_' =>
          val name = word()
          name match {
            case "true" | "True" => true
            case "false" | "False" => false
            case "null" | "None" => null
            case _ =>
              if (quiet) ctx.getOrElse(name, null)
              else ctx.getOrElse(name,
                sys.error(s"undefined name '$name' in expression: $src"))
          }
        case other => sys.error(s"unexpected char '$other' at $pos in: $src")
      }
    }

    // -------------------------------------------------------------- ops

    private def access(v: Any, name: String): Any = v match {
      // the reference's dunder gate (common/security.py, exercised in
      // test_safe_containers): `__`-prefixed attributes never resolve,
      // even when a key of that name exists — sandbox parity
      case _ if name.startsWith("__") => Undefined
      case Api => Api // method resolved at call time
      case m: scala.collection.Map[_, _] =>
        m.asInstanceOf[scala.collection.Map[String, Any]].getOrElse(name, null)
      case null => null
      case _ => v // method target: resolved in call()
    }

    private def call(target: Any, name: String, args: List[Any]): Any =
      target match {
        case Api => if (quiet) null else Api.invoke(name, args)
        case f: Function1[_, _] => f.asInstanceOf[Any => Any](args.head)
        case other => if (quiet) null else sys.error(s"cannot call $other")
      }

    private def index(v: Any, idx: Any): Any = (v, idx) match {
      case (l: Seq[_], i: Long) => if (i >= 0 && i < l.size) l(i.toInt) else null
      case (m: scala.collection.Map[_, _], k) =>
        m.asInstanceOf[scala.collection.Map[Any, Any]].getOrElse(k, null)
      case (s: String, i: Long) => if (i >= 0 && i < s.length) s.charAt(i.toInt).toString else null
      case _ => null
    }
  }

  def looseEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Number, y: Number) => x.doubleValue == y.doubleValue
    case (x, y) => x == y
  }

  def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue, y.doubleValue)
    case (x: String, y: String) => x.compareTo(y)
    case (x: Comparable[_], y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
    case _ => sys.error(s"cannot compare $a and $b")
  }

  def arith(a: Any, b: Any, op: Char): Any = (a, b) match {
    case (x: Long, y: Long) => op match {
      case '+' => x + y
      case '-' => x - y
      case '*' => x * y
      case '/' => if (y != 0 && x % y == 0) x / y else x.toDouble / y
      case '%' => x % y
    }
    case (x: Number, y: Number) =>
      val (xd, yd) = (x.doubleValue, y.doubleValue)
      op match {
        case '+' => xd + yd
        case '-' => xd - yd
        case '*' => xd * yd
        case '/' => xd / yd
        case '%' => xd % yd
      }
    case (x: String, y) if op == '+' => x + String.valueOf(y)
    case (x: Seq[_], y: Seq[_]) if op == '+' => x ++ y
    case _ => sys.error(s"cannot $op on $a, $b")
  }

  object Filters {
    def apply(name: String, v: Any): Any = name match {
      case "bool" => Renderer.stringToBool(v)
      case "int" => v match {
        case n: Number => n.longValue
        case s: String => s.trim.toDouble.toLong
        case true => 1L
        case false => 0L
        case null => 0L
      }
      case "float" => v match {
        case n: Number => n.doubleValue
        case s: String => s.trim.toDouble
        case null => 0.0
      }
      case "str" | "string" => Renderer.Stringify(v)
      case "tojson" => Json.write(v)
      case "upper" => String.valueOf(v).toUpperCase
      case "lower" => String.valueOf(v).toLowerCase
      case "length" | "count" => v match {
        case s: String => s.length.toLong
        case l: Seq[_] => l.size.toLong
        case m: Map[_, _] => m.size.toLong
        case _ => 0L
      }
      case "first" => v match { case l: Seq[_] => l.headOption.orNull; case _ => v }
      case "last" => v match { case l: Seq[_] => l.lastOption.orNull; case _ => v }
      case other => sys.error(s"unknown filter: $other")
    }
  }
}
