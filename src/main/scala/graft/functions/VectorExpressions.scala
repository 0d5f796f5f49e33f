package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for dense-vector math over
  * `array<double>` columns.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback: every call interprets the lambda and materializes an
  * intermediate array, which dominates all-pairs similarity work (O(n²)
  * calls). These expressions instead emit a single fused Java loop over
  * the two `ArrayData` buffers inside WholeStageCodegen — no allocation,
  * no virtual dispatch per element — which is the difference between a
  * similarity join that scales and one that doesn't.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // ExpectsInputTypes needs the private[sql] AbstractDataType; check by hand.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Java statements computing the result into `resultVar` from ArrayData
    * vars `a` and `b` of equal logical dimension (extra elements on the
    * longer side are ignored). Must follow a null-element guard (emitted
    * by doGenCode) — inside the loop body elements are non-null.
    */
  protected def loopCode(ctx: CodegenContext, a: String, b: String, resultVar: String): String

  protected def loopEval(x: ArrayData, y: ArrayData): Double

  /** A null ELEMENT nulls the whole result — matching the zip_with /
    * aggregate higher-order formulation these expressions replaced
    * (`x * y` with a null operand is null, and the running sum absorbs
    * it), and DuckDB's list functions. Reading the null slot as 0.0
    * would silently corrupt similarity scores instead.
    */
  private def anyNullElement(x: ArrayData, y: ArrayData): Boolean = {
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (anyNullElement(x, y)) null else loopEval(x, y)
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("ni")
      val n = ctx.freshName("nn")
      // ev.isNull is declared (and reset to false) by the nullSafeCodeGen
      // wrapper — only assignment here
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  ${loopCode(ctx, a, b, ev.value)}
         |}
       """.stripMargin
    })
}

/** dot(a, b) = Σ aᵢ·bᵢ */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override protected def loopEval(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def loopCode(ctx: CodegenContext, a: String, b: String, result: String): String = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    s"""
       |int $n = Math.min($a.numElements(), $b.numElements());
       |double $dot = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $dot += $a.getDouble($i) * $b.getDouble($i);
       |}
       |$result = $dot;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖), all three accumulators in one pass.
  * Zero-norm inputs yield NaN (same as the naive formula and DuckDB's
  * `list_cosine_similarity`).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override protected def loopEval(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def loopCode(ctx: CodegenContext, a: String, b: String, result: String): String = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    s"""
       |int $n = Math.min($a.numElements(), $b.numElements());
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $xi = $a.getDouble($i);
       |  double $yi = $b.getDouble($i);
       |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
       |}
       |$result = $dot / (Math.sqrt($na) * Math.sqrt($nb));
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2sq(a, b) = Σ (aᵢ−bᵢ)² */
case class L2Squared(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2sq"

  override protected def loopEval(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); acc += d * d; i += 1 }
    acc
  }

  override protected def loopCode(ctx: CodegenContext, a: String, b: String, result: String): String = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    s"""
       |int $n = Math.min($a.numElements(), $b.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = $a.getDouble($i) - $b.getDouble($i);
       |  $acc += $d * $d;
       |}
       |$result = $acc;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    Bridge.column(L2Squared(Bridge.expression(a), Bridge.expression(b)))
}
