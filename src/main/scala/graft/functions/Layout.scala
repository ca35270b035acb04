package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Compiled layout-key kernels (see operators.EventAnalytics
  * zorderLayout for the declarative twin shared with the DuckDB
  * oracle).
  */
object LayoutOps {

  /** Morton interleave of the low 16 bits of x (even positions) and y
    * (odd positions) — bit-for-bit the
    * `aggregate(sequence(0,15), ...)` fold in the declarative form
    * (disjoint bit positions make the fold's `+` an OR).
    */
  def zorderKey(x: Long, y: Long): Long = {
    var z = 0L
    var k = 0
    while (k < 16) {
      z |= ((x >> k) & 1L) << (2 * k)
      z |= ((y >> k) & 1L) << (2 * k + 1)
      k += 1
    }
    z
  }
}

/** `zorder_key(x, y)`: codegen'd Morton bit-interleave of two BIGINT
  * dimensions' low 16 bits — the data-skipping layout key, compiled so
  * the layout write's key projection stays inside whole-stage codegen
  * (the higher-order-function fold it replaces evaluates an interpreted
  * lambda frame per bit per row).
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"expected two bigint, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    LayoutOps.zorderKey(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = LayoutOps.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$helper.zorderKey($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}
