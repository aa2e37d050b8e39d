package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-entropy statistics in ONE compiled pass:
  * `char_entropy_stats(text)` → struct(total, n_distinct, bits_total)
  * where over the document's CHARACTERS (Unicode code points — the unit
  * both Spark's `substring` and DuckDB's `substr` count)
  *  - `total`      = number of characters (= `length(text)`),
  *  - `n_distinct` = number of distinct characters,
  *  - `bits_total` = Σ_c cnt_c · lenbin(total div cnt_c) — t74/t79's
  *    integer-quantized surprisal, lenbin(x) = length of the minimal
  *    binary rendering (= 64 − numberOfLeadingZeros for x ≥ 1).
  *
  * The relational spelling t79 started from — explode one row per
  * character → groupBy(doc_id, c) → groupBy(doc_id) — costs O(n²) per
  * document before it even shuffles: each `substring(text, i, 1)` on a
  * UTF8String must re-scan from the start to find code point i (UTF-8 is
  * variable-width), and the exploded corpus then crosses two aggregation
  * boundaries. This expression decodes the text ONCE (single linear
  * scan, per-row hash state bounded by the alphabet) and keeps the whole
  * computation inside the row: measured 4.7 s → map-only at sf0.1.
  *
  * Counting groups by code point, exactly like grouping the 1-char
  * strings relationally: equal single-character strings ⇔ equal code
  * points, so values match the exploded form (and the DuckDB oracle's
  * substr + GROUP BY) character-for-character.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("bits_total", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_entropy_stats requires a string, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any =
    CharEntropyStats.stats(a.asInstanceOf[UTF8String])

  // stats() never returns null, so defineCodeGen's child-null-only
  // handling is exact (the MinHash8 lesson)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CharEntropyStats.stats($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyStats {
  /** Compiled one-pass twin of explode(chars) → count per char → doc
    * rollup. See class doc for the exact contract. */
  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var total = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cell = counts.get(cp)
      if (cell == null) counts.put(cp, Array(1L)) else cell(0) += 1L
      total += 1L
      i += Character.charCount(cp)
    }
    if (total == 0L)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    var bits = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      bits += c * (64 - java.lang.Long.numberOfLeadingZeros(total / c))
    }
    new GenericInternalRow(Array[Any](total, counts.size().toLong, bits))
  }
}
