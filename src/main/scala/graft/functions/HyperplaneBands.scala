package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Width-PARAMETERIZED banded hyperplane LSH signature —
  * `hyperplane_bands(embedding, bands, bits)` → `array<int>` of `bands`
  * bucket values of `bits` sign bits each, from `bands·bits`
  * deterministic LCG planes in one compiled pass.
  *
  * This is [[HyperplaneBuckets64]] with the published LSH sizing rule
  * exposed as a config: holding the chance-collision rate of a banded
  * self-join needs band width ~2·log₂N bits (E[chance pairs] =
  * bands·C(N,2)/2^bits), so a FIXED width makes the candidate set
  * quadratic once the corpus outgrows 2^bits — measured for t12's 4×16
  * config at the 100× probe (28.7 s, 89× wall for 100× data, the
  * candidate integral exactly as documented). The plane family is the
  * SAME LCG sequence (plane j, any j ≥ 1:
  * `((j·1103515245 + d·12345) mod 32768)/32768 − 0.5`), and bit i of
  * band k polls plane (k−1)·bits + i + 1 — so `hyperplane_bands(e, 4,
  * 16)` is bit-identical to `hyperplane_buckets64(e)` (pinned in
  * HyperplaneBandsSpec): one family, widths for each corpus scale.
  * NaN dots set the bit, matching SQL's `float_dot(...) > 0` under
  * NaN-high ordering (the HyperplaneBuckets64 lesson). Per-type element
  * accessors in both eval paths (the r16 FloatDot ADVICE).
  */
case class HyperplaneBands(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemOf(dt: DataType): Option[DataType] = dt match {
    case ArrayType(t: NumericType, _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (dt, IntegerType, IntegerType) if elemOf(dt).isDefined =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            "hyperplane_bands bands and bits must be literals")
        else (second.eval(), third.eval()) match {
          case (b: Int, w: Int)
            if b >= 1 && w >= 1 && w <= 30 && b.toLong * w <= 1024 =>
            TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            "hyperplane_bands needs bands >= 1, 1 <= bits <= 30, " +
              s"bands*bits <= 1024, got $other")
        }
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bands requires (array<numeric>, int, int), got " +
          s"${a.sql} / ${b.sql} / ${c.sql}")
    }

  private lazy val elemType: DataType = elemOf(first.dataType).get

  private def get(t: DataType, arr: ArrayData, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case other => sys.error(s"unsupported element type $other")
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), 64)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = get(elemType, arr, i); i += 1 }
    HyperplaneBands.buckets(v, b.asInstanceOf[Int], c.asInstanceOf[Int])
  }

  private def accessor(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"(double)$arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double)$arr.getInt($i)"
    case LongType => s"(double)$arr.getLong($i)"
    case ShortType => s"(double)$arr.getShort($i)"
    case ByteType => s"(double)$arr.getByte($i)"
    case d: DecimalType =>
      s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => sys.error(s"unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, b, w) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), 64);
         |double[] $v = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $v[$i] = ${accessor(elemType, c, i)};
         |}
         |${ev.value} = graft.functions.HyperplaneBands.buckets($v, $b, $w);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HyperplaneBands {
  /** Plane tables keyed by plane count (bands·bits ≤ 1024); each entry
    * is planes(j0)(d0) for the first `count` planes of the one LCG
    * family — prefix-consistent across widths by construction. */
  private val tables = new ConcurrentHashMap[Int, Array[Array[Double]]]()

  private def planes(count: Int): Array[Array[Double]] =
    tables.computeIfAbsent(count, c => Array.tabulate(c, 64) { (j0, d0) =>
      val m = ((j0 + 1).toLong * 1103515245L + (d0 + 1).toLong * 12345L) % 32768L
      m.toDouble / 32768.0 - 0.5
    })

  /** bands tight dot loops per band bit over the pre-widened vector. */
  def buckets(v: Array[Double], bands: Int, bits: Int): ArrayData = {
    val p = planes(bands * bits)
    val n = v.length
    val out = new Array[Int](bands)
    var j = 0
    while (j < bands * bits) {
      val pj = p(j)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v(i) * pj(i); i += 1 }
      if (acc > 0 || java.lang.Double.isNaN(acc)) out(j / bits) |= 1 << (j % bits)
      j += 1
    }
    new GenericArrayData(out)
  }
}
