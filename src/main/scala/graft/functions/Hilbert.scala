package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve position of two non-negative long keys on the
  * 2¹⁶ × 2¹⁶ grid, as a native codegen expression — the
  * better-locality sibling of [[ZOrder]]: the Hilbert curve never takes
  * the Morton curve's long diagonal jumps (every consecutive pair of
  * curve positions is a GRID NEIGHBOR — HilbertSpec proves it
  * exhaustively), so range-partitioning by it keeps 2-D-close rows in
  * fewer files at write time, the same data-skipping play with a
  * strictly better clustering bound (cf. the layout literature from
  * Faloutsos & Roseman '89 onward; Delta/Iceberg expose exactly this
  * pair of layout options).
  *
  * The classic xy2d bit-level recurrence (public-domain formulation):
  * per level s = 2¹⁵..1, accumulate the quadrant index s²·((3·rx)⊕ry)
  * and rotate/reflect the frame on the full grid. 16 bits per key keeps
  * the 32-bit result exactly representable and ORACLE-CHECKABLE — the
  * DuckDB mirror replays the identical recurrence as a recursive CTE
  * over levels; callers with wider keys bucket first (layout clustering
  * needs locality, not identity).
  */
case class HilbertEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    HilbertEncode.encode(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HilbertEncode.encode($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertEncode = copy(left = newLeft, right = newRight)
}

object HilbertEncode {

  final val Bits = 16
  final val N = 1L << Bits // grid side

  /** xy2d on the 2¹⁶ grid — low 16 bits of each key. Referenced from
    * generated code: must stay public and allocation-free.
    */
  def encode(xIn: Long, yIn: Long): Long = encode(xIn, yIn, Bits)

  /** The same recurrence on a 2^bits grid (HilbertSpec runs it
    * exhaustively on small grids — the identical code path the
    * expression executes).
    */
  def encode(xIn: Long, yIn: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate/reflect the frame (on the full grid)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column wrapper: `hilbert(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(HilbertEncode(Bridge.expression(a), Bridge.expression(b)))
}
