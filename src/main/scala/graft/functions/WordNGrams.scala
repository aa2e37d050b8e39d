package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All (non-distinct) n-word shingles of a word array, as a native
  * expression: for i in 0..len-n emit `words[i] + " " + … + words[i+n-1]`;
  * empty for shorter inputs. `n` must be a foldable integer ≥ 1.
  *
  * Generalizes the former bigram-only expression (`word_bigrams(w)` stays
  * registered as an alias for `word_ngrams(w, 2)`) for the full Gopher
  * repetition-rule family — duplicate / top 2-, 3- and 4-gram fractions
  * in t20. Semantically identical to DuckDB's
  * `list_transform(range(1, len(words) - n + 2),
  *    i -> array_to_string(words[i:i+n-1], ' '))` oracle twin: both skip
  * null words concat_ws-style, so the output honors containsNull = false
  * even for null-element inputs. The HOF spelling interprets its lambda
  * per window (CodegenFallback); this is one compiled loop entered from
  * whole-stage codegen, like [[WordShingles]].
  */
case class WordNGrams(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("word_ngrams n must be a literal")
        else right.eval() match {
          case n: Int if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"word_ngrams n must be an integer >= 1, got $other")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires (array<string>, int), got ${l.sql} / ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    WordNGrams.ngrams(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  // ngrams() never returns null (empty array for short inputs), so
  // defineCodeGen's child-null-only handling is exact here
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.WordNGrams.ngrams($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordNGrams {
  private val Space = UTF8String.fromString(" ")

  /** Compiled twin of the HOF/oracle forms — see class doc. Null words
    * inside a window are skipped by UTF8String.concatWs exactly as
    * concat_ws / DuckDB array_to_string skip them (an all-null window
    * emits the empty string), so null-element inputs can't NPE or leak
    * nulls into the containsNull = false output. */
  def ngrams(words: ArrayData, n: Int): ArrayData = {
    require(n >= 1, s"word_ngrams n must be >= 1, got $n")
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](len - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        window(j) = if (words.isNullAt(i + j)) null else words.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
