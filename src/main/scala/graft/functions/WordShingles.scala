package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 3-word shingles of a word array, as a native expression.
  *
  * Semantically identical to
  * `array_distinct(transform(sequence(1, greatest(size(words)-2, 1)),
  *   i -> concat_ws(' ', slice(words, i, 3))))`
  * — for i in 1..max(n-2, 1) emit words[i..i+2] joined by one space
  * (shorter at the tail / for <3-word docs), first-occurrence distinct —
  * and to DuckDB's list_distinct/list_transform/array_to_string oracle
  * twin. The composed form chains three higher-order functions, which
  * are CodegenFallback and interpret their lambdas per element; at sf0.1
  * that made shingling alone cost 2.1 s of t03's 3.5 s (T03Probe). This
  * expression is one compiled loop entered directly from whole-stage
  * codegen.
  */
case class WordShingles(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    WordShingles.shingle(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingle($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** Compiled twin of the composed HOF form — see class doc. */
  def shingle(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val count = math.max(n - 2, 1)
    // LinkedHashSet: first-occurrence order, same as array_distinct
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + 3, n)
      // concat_ws(' ', slice(...)): null elements are skipped
      val parts = new java.util.ArrayList[UTF8String](3)
      var j = i
      while (j < end) {
        if (!words.isNullAt(j)) parts.add(words.getUTF8String(j))
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, parts.toArray(new Array[UTF8String](parts.size)): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }
}
