package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-document n-gram statistics in ONE compiled pass:
  * `ngram_stats(words, n)` → struct(total, n_distinct, top, dup) where
  * over the document's n-grams (the [[WordNGrams]] windows)
  *  - `total`      = number of n-grams (= max(len − n + 1, 0)),
  *  - `n_distinct` = number of distinct n-gram strings,
  *  - `top`        = highest per-gram occurrence count (0 when total = 0),
  *  - `dup`        = Σ count over grams occurring more than once.
  *
  * These four numbers are exactly what the Gopher repetition rules (t20)
  * and the composite filter verdict (t30) consume per document. The
  * relational spelling — explode(word_ngrams) → groupBy(doc_id, tok) →
  * groupBy(doc_id) — shuffles EVERY token of the corpus twice to compute
  * a quantity that only ever depends on one row; this expression keeps
  * the whole computation inside the row (per-doc hash state, bounded by
  * document length — the same working set DuckDB's per-group hash uses),
  * so per-document quality scoring needs ZERO shuffles at any corpus
  * size.
  *
  * Counting runs over the identical [[WordNGrams.ngrams]] windows, so
  * values match the exploded relational form (and the DuckDB oracle's
  * unnest + GROUP BY) gram-for-gram. The one semantic divergence is
  * null word elements (a null explodes to a NULL group relationally but
  * concat_ws-joins to "" here) — unreachable from `split()` output,
  * which never contains nulls.
  */
case class NGramStats(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("ngram_stats n must be a literal")
        else right.eval() match {
          case n: Int if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"ngram_stats n must be an integer >= 1, got $other")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ngram_stats requires (array<string>, int), got ${l.sql} / ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    NGramStats.stats(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  // stats() never returns null, so defineCodeGen's child-null-only
  // handling is exact (the MinHash8 lesson: a result-null would need
  // nullSafeCodeGen with an explicit ev.isNull assignment)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NGramStats.stats($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NGramStats {
  /** Compiled one-pass twin of explode(word_ngrams) → count/distinct/
    * max/dup-sum per document. See class doc for the exact contract. */
  def stats(words: ArrayData, n: Int): InternalRow = {
    val grams = WordNGrams.ngrams(words, n)
    val total = grams.numElements()
    if (total == 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L))
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]()
    var i = 0
    while (i < total) {
      val g = grams.getUTF8String(i)
      val cell = counts.get(g)
      if (cell == null) counts.put(g, Array(1L)) else cell(0) += 1L
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > top) top = c
      if (c > 1L) dup += c
    }
    new GenericInternalRow(
      Array[Any](total.toLong, counts.size().toLong, top, dup))
  }
}
