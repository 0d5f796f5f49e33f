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

/** l2sq_at(full, sub, off) = Σ_{i<n} (full[off+i] − sub[i])² with
  * n = min(|sub|, |full|−off) — the OFFSET variant of [[L2Squared]]
  * that reads a subspace window of `full` in place. The PQ family's
  * hot loops (the per-subspace ADC distance, the encode arg-min)
  * otherwise compute `l2sq(centroid, slice(v, off+1, len))`, and
  * `slice` allocates a copy of the window per row × subspace ×
  * candidate — at a billion codes that allocation storm IS the scan
  * cost. Semantics (incl. element-null and short-array behavior) are
  * bit-identical to the slice formulation; VectorExpressionsSpec pins
  * the parity in both execution modes.
  */
case class L2SquaredAt(left: Expression, right: Expression, offset: Int)
    extends BinaryExpression {
  override def prettyName: String = "vec_l2sq_at"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType) && offset >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments and offset >= 0")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(y.numElements(), math.max(0, x.numElements() - offset))
    var i = 0
    while (i < n) {
      if (x.isNullAt(offset + i) || y.isNullAt(i)) return null
      i += 1
    }
    var acc = 0.0
    i = 0
    while (i < n) {
      val d = x.getDouble(offset + i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($b.numElements(), Math.max(0, $a.numElements() - $offset));
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i + $offset) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $d = $a.getDouble($j + $offset) - $b.getDouble($j);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    Bridge.column(L2Squared(Bridge.expression(a), Bridge.expression(b)))
  def l2sqAt(full: Column, sub: Column, offset: Int): Column =
    Bridge.column(L2SquaredAt(Bridge.expression(full), Bridge.expression(sub), offset))
}
