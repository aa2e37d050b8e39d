package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** t12's banded hyperplane LSH signature — 64 deterministic LCG planes
  * → 4 bands × 16 sign bits — in ONE compiled pass, as a native
  * expression returning `array<int>` of the 4 bucket values.
  *
  * Semantically identical to the composed form it replaces (64×
  * `float_dot(embedding, planeCol(j))` sign tests summed into 4
  * buckets): each plane dot is the same ascending-index left fold with
  * the same double widening as [[FloatDot]], the planes are the same
  * `((j·1103515245 + d·12345) mod 32768)/32768 − 0.5` doubles (computed
  * once into a static table by the SAME Scala arithmetic that built the
  * old literals), and bit i of band k is `dot_{(k−1)·16+i+1} > 0`.
  * The DuckDB oracle's spelling is unchanged. Like FloatDot, every
  * numeric element type is widened to double with a per-type accessor
  * (r16 ADVICE: the float-else-getDouble shortcut misread 4-byte int
  * slots and ClassCastException'd on decimals).
  *
  * Scale note (T12BandsLab, r16): the composed form's 64-dot projection
  * cannot split inside whole-stage codegen, and past ~2 bands the
  * generated method crosses the JVM's huge-method JIT limit — the whole
  * stage runs as INTERPRETED bytecode (2 bands 0.65 s → 4 bands 13.6 s
  * on the same 60k rows). This expression is one tight JIT-friendly
  * loop: the signature pass drops ~20× at the 30× probe scale. */
case class HyperplaneBuckets64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemOf(dt: DataType): Option[DataType] = dt match {
    case ArrayType(t: NumericType, _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOf(child.dataType).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets64 requires a numeric array, got ${child.dataType.sql}")

  private lazy val elemType: DataType = elemOf(child.dataType).get

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

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), 64)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = get(elemType, arr, i); i += 1 }
    HyperplaneBuckets64.bucketsFromDoubles(v)
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
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), 64);
         |double[] $v = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $v[$i] = ${accessor(elemType, c, i)};
         |}
         |${ev.value} = graft.functions.HyperplaneBuckets64.bucketsFromDoubles($v);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets64 {
  /** plane(j)(d−1) for j,d ∈ 1..64 — the exact doubles
    * TrainingData.planeCol built as literals (same Scala arithmetic). */
  private val planes: Array[Array[Double]] = Array.tabulate(64, 64) { (j0, d0) =>
    val m = ((j0 + 1).toLong * 1103515245L + (d0 + 1).toLong * 12345L) % 32768L
    m.toDouble / 32768.0 - 0.5
  }

  /** 64 tight dot loops over the pre-widened vector (≤64 elements). */
  def bucketsFromDoubles(v: Array[Double]): ArrayData = {
    val n = v.length
    val out = new Array[Int](4)
    var j = 0
    while (j < 64) {
      val p = planes(j)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v(i) * p(i); i += 1 }
      // Spark SQL (and DuckDB) order NaN above every value, so the
      // composed form's `float_dot(...) > 0` is TRUE for a NaN dot;
      // plain Java `>` would say false — match the SQL semantics
      // (caught by the adversarial-input pin in the spec)
      if (acc > 0 || java.lang.Double.isNaN(acc)) out(j / 16) |= 1 << (j % 16)
      j += 1
    }
    new GenericArrayData(out)
  }
}
