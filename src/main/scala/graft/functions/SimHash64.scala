package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token array in ONE compiled pass — the
  * width-parameterized sibling of [[SimHash16]] (r17 verdict: a FIXED
  * 16-bit fingerprint makes the hamming-near-dup ANSWER itself Θ(n²)
  * once the corpus outgrows 2¹⁶; widening the fingerprint with the
  * corpus is the scale path, and 64 bits banded 4×16 retrieves
  * hamming ≤ 3 exactly while chance bit-collisions vanish —
  * E[C(n,2)·Σ_{k≤3}C(64,k)/2⁶⁴] ≈ 0 at any realistic n).
  *
  * Same digit-probe numbering as [[SimHash16]], extended to md5's 16
  * leading hex digits: per token, bit i of the SimHash polls bit i%4 of
  * hex digit i/4 (digit 0 = the md5's first hex char = the high nibble
  * of digest byte 0), votes sum +1/-1 over ALL token occurrences, and a
  * positive total sets the bit. Null for empty arrays. Because digits
  * 0..3 are shared and the per-digit bit-numbering is identical,
  * `simhash64(toks) & 0xFFFF == simhash16(toks)` for every input — the
  * family-containment law Simhash64Spec pins, which ties the 64-bit
  * near-dup answer back to t18's oracle-gated 16-bit one.
  *
  * The DuckDB oracle keeps the exploded digit-probe spelling at 16
  * digits (TrainingData.simhash64Duck); bit parity is proven by
  * Simhash64Spec and the driver hash gate.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SimHash64.hash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("sh64Boxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Long $v = graft.functions.SimHash64.hash($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Boxed so codegen can represent the empty-array null. */
  def hash(tokens: ArrayData): java.lang.Long = {
    val n = tokens.numElements()
    if (n == 0) return null
    val md = digestTL.get()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (tokens.isNullAt(t)) {
        // relational parity: md5(NULL) → null hv → every
        // CASE WHEN bit=1 THEN 1 ELSE -1 lands in the ELSE
        var i = 0
        while (i < 64) { votes(i) -= 1; i += 1 }
      } else {
        md.reset()
        val d = md.digest(tokens.getUTF8String(t).getBytes)
        // hv = the 16 leading hex digits = the first 8 digest bytes,
        // big-endian; digit j sits at hv bits 60-4j .. 63-4j, so bit i
        // of the SimHash (digit i/4, digit-bit i%4) polls hv bit
        // 60 - 4*(i/4) + i%4 — the same numbering SimHash16 uses on
        // its 4-digit hv, so the low 16 fingerprint bits coincide.
        var hv = 0L
        var b = 0
        while (b < 8) { hv = (hv << 8) | (d(b) & 0xFFL); b += 1 }
        var i = 0
        while (i < 64) {
          val shift = 60 - 4 * (i / 4) + i % 4
          votes(i) += (if (((hv >>> shift) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var value = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) value |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(value)
  }
}
