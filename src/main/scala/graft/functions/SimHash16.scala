package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 16-bit SimHash of a token array in ONE compiled pass, as a native
  * expression.
  *
  * Semantically identical to the exploded relational form (the DuckDB
  * oracle's spelling, TrainingData.simhash16Duck): per token, md5's 4
  * leading hex digits decode to a 16-bit value `hv`; bit i of the
  * SimHash polls bit `12 - 4*(i/4) + i%4` of `hv` (the digit-probe
  * numbering), votes sum +1/-1 over ALL token occurrences (not
  * distinct), and a positive total sets the bit. Null for empty arrays
  * (agg over zero rows).
  *
  * Scale note: removes the explode → groupBy(doc_id) → 16 conditional
  * sums leg — signature becomes a pure map with one reused
  * MessageDigest, like [[MinHash8]].
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires array<string>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SimHash16.hash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("shBoxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Integer $v = graft.functions.SimHash16.hash($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash16 {
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Boxed so codegen can represent the empty-array null. */
  def hash(tokens: ArrayData): Integer = {
    val n = tokens.numElements()
    if (n == 0) return null
    val md = digestTL.get()
    val votes = new Array[Int](16)
    var t = 0
    while (t < n) {
      if (tokens.isNullAt(t)) {
        // relational parity: md5(NULL) → null hv → every
        // CASE WHEN bit=1 THEN 1 ELSE -1 lands in the ELSE
        var i = 0
        while (i < 16) { votes(i) -= 1; i += 1 }
      } else {
        md.reset()
        val d = md.digest(tokens.getUTF8String(t).getBytes)
        // hv = the 4 leading hex digits = the first two digest bytes
        val hv = ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
        var i = 0
        while (i < 16) {
          val shift = 12 - 4 * (i / 4) + i % 4
          votes(i) += (if (((hv >> shift) & 1) == 1) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var value = 0
    var i = 0
    while (i < 16) {
      if (votes(i) > 0) value |= 1 << i
      i += 1
    }
    Integer.valueOf(value)
  }
}
