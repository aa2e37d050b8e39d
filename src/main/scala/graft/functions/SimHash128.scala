package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** 128-bit SimHash of a token array in ONE compiled pass — the full-md5
  * width of the [[SimHash16]]/[[SimHash64]] family (r19 verdict, What's
  * wrong #1: t101's 64-bit fingerprint makes the near-dup ANSWER linear,
  * but its forced 4×16-bit pigeonhole bands admit ~4·2⁻¹⁶·C(n,2) chance
  * CANDIDATES — ≈3·10¹³ at 10⁹ docs — so the popcount-verify stream
  * goes quadratic at warehouse N. Widening the BAND, not just the
  * fingerprint, is the fix, and a 128-bit fingerprint gives 4 bands
  * room to grow to 32 bits each: chance candidates 4·C(n,2)/2^w, under
  * one per document at 10⁹ docs with w = 32).
  *
  * Returns `array<bigint>` of exactly two words: word 0 = fingerprint
  * bits 0..63, word 1 = bits 64..127. Same digit-probe numbering as its
  * siblings, extended to md5's FULL 32 hex digits: bit i of the
  * fingerprint polls bit i%4 of hex digit i/4 (digit 0 = the md5's
  * first hex char), votes sum +1/-1 over ALL token occurrences (a null
  * token votes -1 on every bit — the relational CASE-ELSE parity), and
  * a positive total sets the bit. Null for empty arrays. Because digits
  * 0..15 and the per-digit numbering are exactly [[SimHash64]]'s,
  * `simhash128(toks)[0] == simhash64(toks)` for every input (hence
  * `[0] & 0xFFFF == simhash16(toks)`) — the family-containment law
  * Simhash128Spec pins, tying the 128-bit near-dup answer back through
  * t101's oracle-gated 64-bit one to t18's 16-bit fixture twin.
  *
  * The DuckDB oracle keeps the exploded digit-probe spelling at 32
  * digits (TrainingData.simhash128Duck); bit parity is proven by
  * Simhash128Spec and the driver hash gate.
  */
case class SimHash128(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash128 requires array<string>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SimHash128.hash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("sh128")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $v =
         |  graft.functions.SimHash128.hash($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash128 {
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Null (not an array) for the empty-array case, like SimHash64. */
  def hash(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return null
    val md = digestTL.get()
    val votes = new Array[Int](128)
    var t = 0
    while (t < n) {
      if (tokens.isNullAt(t)) {
        var i = 0
        while (i < 128) { votes(i) -= 1; i += 1 }
      } else {
        md.reset()
        val d = md.digest(tokens.getUTF8String(t).getBytes)
        // hv0 = hex digits 0..15 (digest bytes 0..7, big-endian), hv1 =
        // digits 16..31 (bytes 8..15). Within each 64-bit half, digit j
        // sits at bits 60-4j .. 63-4j, so fingerprint bit i polls half
        // i/64 at shift 60 - 4*((i%64)/4) + i%4 — for i < 64 this is
        // exactly SimHash64's probe, making word 0 the family pin.
        var hv0 = 0L; var hv1 = 0L
        var b = 0
        while (b < 8) { hv0 = (hv0 << 8) | (d(b) & 0xFFL); b += 1 }
        while (b < 16) { hv1 = (hv1 << 8) | (d(b) & 0xFFL); b += 1 }
        var i = 0
        while (i < 128) {
          val half = if (i < 64) hv0 else hv1
          val j = i & 63
          val shift = 60 - 4 * (j / 4) + (j % 4)
          votes(i) += (if (((half >>> shift) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var w0 = 0L; var w1 = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) w0 |= 1L << i
      if (votes(i + 64) > 0) w1 |= 1L << i
      i += 1
    }
    new GenericArrayData(Array(w0, w1))
  }
}
