package graft.sqlbridge

import scala.collection.mutable

/** Low-level SQL text utilities shared by the translation passes.
  *
  * All rewriting in the engine is textual (like the reference, which
  * swaps table nodes in SQL strings — ankaflow/connections/connection.py:
  * 259-288) but string-literal aware: nothing inside '...' is touched.
  */
object SqlText {

  sealed trait Tok { def text: String }
  final case class Str(text: String) extends Tok      // 'literal' (incl quotes)
  final case class QuotedId(text: String) extends Tok // "ident" or `ident`
  final case class Word(text: String) extends Tok     // identifier / keyword
  final case class Sym(text: String) extends Tok      // everything else

  /** Tokenize SQL preserving every character (concat of texts == input). */
  def tokenize(sql: String): Vector[Tok] = {
    val out = mutable.ArrayBuffer[Tok]()
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c == '\'') {
        val start = i
        i += 1
        var done = false
        while (i < n && !done) {
          if (sql(i) == '\'') {
            if (i + 1 < n && sql(i + 1) == '\'') i += 2 // escaped ''
            else { i += 1; done = true }
          } else i += 1
        }
        out += Str(sql.substring(start, i))
      } else if (c == '"' || c == '`') {
        val start = i
        i += 1
        while (i < n && sql(i) != c) i += 1
        if (i < n) i += 1
        out += QuotedId(sql.substring(start, i))
      } else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        val start = i
        while (i < n && sql(i) != '\n') i += 1
        out += Sym(sql.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        out += Word(sql.substring(start, i))
      } else {
        val start = i
        i += 1
        out += Sym(sql.substring(start, i))
      }
    }
    out.toVector
  }

  def render(toks: Seq[Tok]): String = toks.map(_.text).mkString

  /** Case-insensitive word check. */
  def isWord(t: Tok, w: String): Boolean = t match {
    case Word(x) => x.equalsIgnoreCase(w)
    case _ => false
  }

  /** Find the matching close paren index in `toks`, given `open` at the
    * index of a "(" Sym. Returns index of the ")" Sym. */
  def matchParen(toks: Vector[Tok], open: Int): Int = {
    var depth = 0
    var i = open
    while (i < toks.length) {
      toks(i) match {
        case Sym("(") => depth += 1
        case Sym(")") =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    sys.error(s"unbalanced parens in SQL: ${render(toks)}")
  }

  /** Split the token range (exclusive of outer parens) at top-level commas. */
  def splitArgs(toks: Vector[Tok]): List[Vector[Tok]] = {
    val args = mutable.ListBuffer[Vector[Tok]]()
    var cur = mutable.ArrayBuffer[Tok]()
    var depth = 0
    toks.foreach {
      case t @ Sym("(") => depth += 1; cur += t
      case t @ Sym(")") => depth -= 1; cur += t
      case Sym(",") if depth == 0 =>
        args += cur.toVector; cur = mutable.ArrayBuffer[Tok]()
      case t => cur += t
    }
    if (cur.nonEmpty || args.nonEmpty) args += cur.toVector
    args.toList.map(a => trimTok(a))
  }

  def trimTok(a: Vector[Tok]): Vector[Tok] = {
    val isBlank = (t: Tok) => t match {
      case Sym(s) => s.trim.isEmpty
      case _ => false
    }
    a.dropWhile(isBlank).reverse.dropWhile(isBlank).reverse
  }

  /** First index ≥ `from` that is not a whitespace Sym. */
  def nextNonBlank(toks: Vector[Tok], from: Int): Int = {
    var j = from
    while (j < toks.length && toks(j).isInstanceOf[Sym] &&
      toks(j).text.trim.isEmpty) j += 1
    j
  }

  /** Strip the quotes off a quoted identifier. */
  def unquote(id: String): String =
    if (id.length >= 2 && (id.head == '"' || id.head == '`')) id.substring(1, id.length - 1)
    else id
}
