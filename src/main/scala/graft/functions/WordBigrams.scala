package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All (non-distinct) 2-word shingles of a word array, as a native
  * expression: for i in 0..n-2 emit `words[i] + " " + words[i+1]`;
  * empty for <2-word inputs.
  *
  * Semantically identical to the composed HOF form
  * `transform(slice(words, 1, size(words)-1),
  *    (x, i) -> concat(x, ' ', element_at(words, i + 2)))`
  * and to DuckDB's `list_transform(range(1, len(words)),
  * i -> array_to_string(words[i:i+1], ' '))` oracle twin. The HOF chain
  * interprets its lambda per word (CodegenFallback) — ~2M evals at
  * sf0.1, a measurable slice of t20 — while this is one compiled loop
  * entered from whole-stage codegen, like [[WordShingles]].
  */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_bigrams requires array<string>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    WordBigrams.bigrams(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordBigrams.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordBigrams {
  private val Space = UTF8String.fromString(" ")

  /** Compiled twin of the composed HOF form — see class doc. Null words
    * are skipped concat_ws-style (DuckDB array_to_string semantics), so
    * the output honors containsNull = false even for null-element inputs
    * — the split(" ") source never produces them, but checkInputDataTypes
    * admits ArrayType(StringType, true) and the eval path must not NPE
    * or emit nulls into a non-null array. */
  def bigrams(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](n - 1)
    var i = 0
    while (i < n - 1) {
      val a = if (words.isNullAt(i)) null else words.getUTF8String(i)
      val b = if (words.isNullAt(i + 1)) null else words.getUTF8String(i + 1)
      out(i) =
        if (a == null && b == null) UTF8String.EMPTY_UTF8
        else if (a == null) b
        else if (b == null) a
        else UTF8String.concat(a, Space, b)
      i += 1
    }
    new GenericArrayData(out)
  }
}
