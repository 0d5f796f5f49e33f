package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve value of two non-negative long keys as a
  * native codegen expression: bit-interleaves the low 31 bits of each
  * input so that sorting by the result clusters rows that are close in
  * BOTH dimensions — the multi-dimensional data-layout primitive behind
  * min/max-zone data skipping (sort/repartitionByRange by `zorder(a,b)`
  * at write time, and scans filtered on either dimension prune most
  * files, not just scans filtered on the leading sort key).
  *
  * The interleave is the classic magic-number bit spread (public-domain
  * "Interleave bits by Binary Magic Numbers" bit hack) — five
  * shift/mask rounds per operand, branch-free, inside WholeStageCodegen.
  * 31 bits per operand keeps the 62-bit result positive in any engine's
  * signed BIGINT, which is what makes the value oracle-checkable;
  * callers with wider keys bucket them first (layout clustering needs
  * locality, not identity).
  */
case class ZOrder(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder.interleave($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrder = copy(left = newLeft, right = newRight)
}

object ZOrder {

  /** Spread the low 31 bits of v into the even bit positions 0..60. */
  def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: a's bits at even positions, b's at odd. Referenced
    * from generated code — must stay public and allocation-free.
    */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  /** Column wrapper: `zorder(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(ZOrder(Bridge.expression(a), Bridge.expression(b)))
}
