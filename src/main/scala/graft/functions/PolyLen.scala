package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `len()` is polymorphic — characters of a string, elements of
  * a list — and returns BIGINT. Spark splits this across `length`
  * (string/binary only) and `size`/`cardinality` (array/map only), so a
  * textual swap can't pick the right one. This expression dispatches on
  * the child's resolved type at analysis; registered as SQL `graft_len`
  * and targeted by the SqlBridge `len` swap. */
case class PolyLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType: len(NULL) is NULL in DuckDB — the null-safe eval path
    // returns null before the (never-reached) accessor dispatch
    case StringType | BinaryType | _: ArrayType | _: MapType | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"len requires a string, binary, array, or map argument, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => v.asInstanceOf[UTF8String].numChars().toLong
    case BinaryType => v.asInstanceOf[Array[Byte]].length.toLong
    case _: ArrayType => v.asInstanceOf[ArrayData].numElements().toLong
    case _: MapType => v.asInstanceOf[MapData].numElements().toLong
    case other => sys.error(s"unsupported type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val access = child.dataType match {
        case StringType => s"(long) $c.numChars()"
        case BinaryType => s"(long) $c.length"
        case _: ArrayType | _: MapType => s"(long) $c.numElements()"
        case other => sys.error(s"unsupported type $other")
      }
      s"${ev.value} = $access;"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
