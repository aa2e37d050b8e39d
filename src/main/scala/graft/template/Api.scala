package graft.template

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Template helper object `API` (reference: ankaflow/api.py:12-166). */
object Api {

  def invoke(name: String, args: List[Any]): Any = name match {
    case "dt" => dt(args)
    case "look" => look(args)
    case "sqltuple" => sqltuple(args)
    case "setvariable" =>
      val List(vars, k, v) = args
      vars match {
        case m: scala.collection.mutable.Map[_, _] =>
          m.asInstanceOf[scala.collection.mutable.Map[String, Any]]
            .put(String.valueOf(k), v)
        case _ => sys.error("API.setvariable: first arg must be variables")
      }
      "" // renders as empty
    case "error" =>
      val expr = args.head
      val msg = if (args.size > 1) String.valueOf(args(1)) else "API.error"
      if (Renderer.stringToBool(expr)) sys.error(msg)
      ""
    case "int" => ExprEval.Filters("int", args.head)
    case "peek" =>
      System.err.println(s"[API.peek] ${args.headOption.orNull}")
      args.headOption.orNull
    case other => sys.error(s"unknown API helper: API.$other")
  }

  /** Robust date parse → ISO string. Accepts ISO strings, epoch seconds /
    * millis / nanos (numeric), with optional default fallback.
    * (reference: api.py API.dt — arrow-based parse incl. ns epoch). */
  def dt(args: List[Any]): String = {
    val value = args.headOption.orNull
    val default = if (args.size > 1) Option(args(1)) else None
    try {
      val inst: Instant = value match {
        case n: Long => epochToInstant(n.toDouble)
        case d: Double => epochToInstant(d)
        case s: String if s.matches("-?\\d+(\\.\\d+)?") => epochToInstant(s.toDouble)
        case s: String =>
          val t = s.trim.replace(" ", "T")
          // offset-aware strings keep their offset (arrow.get preserves
          // it; stripping and reinterpreting as UTC shifts the instant)
          if (t.matches(".*([Zz]|[+-]\\d{2}:?\\d{2})$"))
            java.time.OffsetDateTime.parse(t).toInstant
          else if (t.contains("T"))
            LocalDateTime.parse(t).toInstant(ZoneOffset.UTC)
          else LocalDate.parse(t).atStartOfDay.toInstant(ZoneOffset.UTC)
        case other => sys.error(s"API.dt: cannot parse $other")
      }
      DateTimeFormatter.ISO_INSTANT.format(inst).replace("Z", "+00:00")
    } catch {
      case e: Exception => default match {
        case Some(d) => String.valueOf(d)
        case None => throw new IllegalArgumentException(s"API.dt($value): ${e.getMessage}")
      }
    }
  }

  private def epochToInstant(v: Double): Instant = {
    // reference semantics (api.py:47-49): ints > 1e10 are NANOSECONDS
    // (pd.to_datetime on int), anything smaller is epoch seconds
    if (math.abs(v) > 1e10)
      Instant.ofEpochSecond((v / 1e9).toLong, (v % 1e9).toLong)
    else Instant.ofEpochSecond(v.toLong, ((v - v.toLong) * 1e9).toLong)
  }

  /** JMESPath subset: dotted paths + [n] indexes over maps/lists.
    * API.look(path, data, default=null). */
  def look(args: List[Any]): Any = {
    val path = String.valueOf(args.head)
    val data = args(1)
    val default = if (args.size > 2) args(2) else null
    val segs = path.split("\\.").toList.flatMap { seg =>
      val m = "(\\w+)((\\[\\d+\\])*)".r.findFirstMatchIn(seg)
      m match {
        case Some(mm) =>
          val idxs = "\\[(\\d+)\\]".r.findAllMatchIn(mm.group(2))
            .map(_.group(1).toInt).toList
          Left(mm.group(1)) :: idxs.map(Right(_))
        case None => List(Left(seg))
      }
    }
    var cur: Any = data
    segs.foreach {
      case Left(key) => cur = cur match {
        case m: scala.collection.Map[_, _] =>
          m.asInstanceOf[scala.collection.Map[String, Any]].getOrElse(key, null)
        case _ => null
      }
      case Right(i) => cur = cur match {
        case l: Seq[_] => if (i < l.size) l(i) else null
        case _ => null
      }
    }
    if (cur == null) default else cur
  }

  /** Render an iterable as a SQL tuple: mode "str" quotes elements.
    * API.sqltuple([1,2], 'int') → "(1,2)"; (['a'],'str') → "('a')". */
  def sqltuple(args: List[Any]): String = {
    val it = args.head match {
      case l: Seq[_] => l
      case other => Seq(other)
    }
    val mode = if (args.size > 1) String.valueOf(args(1)) else "str"
    val parts = it.map { v =>
      if (mode == "str") "'" + String.valueOf(v).replace("'", "''") + "'"
      else String.valueOf(v)
    }
    parts.mkString("(", ",", ")")
  }
}
