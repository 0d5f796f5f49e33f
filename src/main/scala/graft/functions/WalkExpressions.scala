package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused codegen neighbor selection for the derandomized walk loops
  * ([[graft.graph.Walks]]).
  *
  * The round-6 formulation ran the per-step argmin/A-ES selection as an
  * `aggregate()` higher-order fold over the sorted adjacency array.
  * Higher-order functions are CodegenFallback: every md5/conv/pow call
  * evaluated interpreted, per neighbor per walker per step (~12M boxed
  * expression evals at sf0.1) — fine in a fresh JVM, pathological under
  * a full 166-query run's accumulated heap pressure (4.2 → 15.4 s
  * full-run inflation, the same signature as round 4's label-prop).
  * These expressions are the `WinnowFingerprints` treatment (11× there):
  * ONE tight Java loop per walker per step, inside WholeStageCodegen,
  * no per-neighbor allocation beyond the md5 input bytes.
  *
  * Bit-parity contracts with the fold they replace (and therefore with
  * the unrolled SQL oracles, asserted in WalkExpressionsSpec):
  *  - uniform: keeps the neighbor minimizing the md5 HEX STRING of
  *    "walkId:step:nb"; unsigned byte-wise digest comparison is
  *    identical to lexicographic hex comparison (nibble→hex-char is
  *    monotone), strict-less over the ascending array keeps the SMALLER
  *    nb on a digest tie — exactly `min(struct(h, nb))`.
  *  - node2vec: A-ES key `round(pow(u, 1/α), 9)` with u the first 13
  *    md5 hex chars as a 52-bit uniform (exactly representable in a
  *    double), α the p/q bias; `>=` over the ascending array keeps the
  *    LARGER nb on a key tie — exactly `max(struct(k, nb))`. The round
  *    replicates Spark's `Round(_, 9)` double path bit-for-bit
  *    (`BigDecimal.valueOf(x).setScale(9, HALF_UP)`), so cross-engine
  *    pow ULP still can't flip a pick.
  */
abstract class WalkPickExpression extends Expression {
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def foldable: Boolean = false
}

/** Uniform pick: argmin over md5("walkId:step:nb") — null on a null or
  * empty adjacency array (dead-end walker stays put).
  */
case class UniformWalkPick(walkId: Expression, nbrs: Expression, step: Int)
    extends WalkPickExpression {
  override def prettyName: String = "uniform_walk_pick"
  override def children: Seq[Expression] = Seq(walkId, nbrs)

  override def checkInputDataTypes(): TypeCheckResult =
    (walkId.dataType, nbrs.dataType) match {
      case (LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, array<bigint>), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val w = walkId.eval(input)
    val a = nbrs.eval(input)
    if (w == null || a == null) null
    else WalkPick.uniform(w.asInstanceOf[Long], step,
      a.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = walkId.genCode(ctx)
    val a = nbrs.genCode(ctx)
    val boxed = ctx.freshName("picked")
    ev.copy(code = code"""
      ${w.code}
      ${a.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${w.isNull} && !${a.isNull}) {
        java.lang.Long $boxed =
          graft.functions.WalkPick.uniform(${w.value}, $step, ${a.value});
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed.longValue();
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(walkId = newChildren(0), nbrs = newChildren(1))
}

/** node2vec A-ES pick: argmax of round(pow(u, 1/α), 9) with the
  * second-order α from (prev, pnbrs) carried in walker state. `prev`
  * and `pnbrs` are null at step 1 (uniform 1/q bias, per the loop's
  * contract); null/empty `nbrs` → null (dead end).
  */
case class Node2vecWalkPick(walkId: Expression, nbrs: Expression,
    pnbrs: Expression, prev: Expression, step: Int, p: Double, q: Double)
    extends WalkPickExpression {
  override def prettyName: String = "node2vec_walk_pick"
  override def children: Seq[Expression] = Seq(walkId, nbrs, pnbrs, prev)

  override def checkInputDataTypes(): TypeCheckResult =
    (walkId.dataType, nbrs.dataType, pnbrs.dataType, prev.dataType) match {
      case (LongType, ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, array<bigint>, array<bigint>, bigint), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val w = walkId.eval(input)
    val a = nbrs.eval(input)
    if (w == null || a == null) return null
    val pn = pnbrs.eval(input)
    val pv = prev.eval(input)
    WalkPick.node2vec(w.asInstanceOf[Long], step, a.asInstanceOf[ArrayData],
      pn.asInstanceOf[ArrayData],
      if (pv == null) null else java.lang.Long.valueOf(pv.asInstanceOf[Long]),
      p, q)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = walkId.genCode(ctx)
    val a = nbrs.genCode(ctx)
    val pn = pnbrs.genCode(ctx)
    val pv = prev.genCode(ctx)
    val boxed = ctx.freshName("picked")
    ev.copy(code = code"""
      ${w.code}
      ${a.code}
      ${pn.code}
      ${pv.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${w.isNull} && !${a.isNull}) {
        java.lang.Long $boxed = graft.functions.WalkPick.node2vec(
          ${w.value}, $step, ${a.value},
          ${pn.isNull} ? null : ${pn.value},
          ${pv.isNull} ? null : java.lang.Long.valueOf(${pv.value}),
          $p, $q);
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed.longValue();
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(walkId = newChildren(0), nbrs = newChildren(1),
      pnbrs = newChildren(2), prev = newChildren(3))
}

/** Referenced from generated code — public static-style helpers, one
  * tight loop each, ThreadLocal digest reuse (same discipline as
  * [[WinnowFingerprints.winnow]]).
  */
object WalkPick {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Unsigned byte-wise digest comparison — identical ordering to the
    * lexicographic comparison of the lowercase hex strings Spark's
    * `md5()` emits (each nibble maps monotonically to its hex char).
    */
  private def lessUnsigned(x: Array[Byte], y: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val a = x(i) & 0xff
      val b = y(i) & 0xff
      if (a != b) return a < b
      i += 1
    }
    false
  }

  private def digest(walkId: Long, step: Int, nb: Long): Array[Byte] = {
    val sb = new java.lang.StringBuilder(44)
    sb.append(walkId).append(':').append(step).append(':').append(nb)
    val md = mdLocal.get()
    md.reset()
    md.digest(sb.toString.getBytes(StandardCharsets.US_ASCII))
  }

  def uniform(walkId: Long, step: Int, nbrs: ArrayData): java.lang.Long = {
    val n = nbrs.numElements()
    if (n == 0) return null
    var bestDig: Array[Byte] = null
    var bestNb = 0L
    var i = 0
    while (i < n) {
      val b = nbrs.getLong(i)
      val dig = digest(walkId, step, b)
      // strict less: the FIRST minimal digest wins, i.e. the smaller nb
      // on a tie (array is ascending) — exactly min(struct(h, nb))
      if (bestDig == null || lessUnsigned(dig, bestDig)) {
        bestDig = dig
        bestNb = b
      }
      i += 1
    }
    java.lang.Long.valueOf(bestNb)
  }

  /** Sorted-ascending membership test (adjacency arrays come from
    * `array_sort(collect_set(...))`): zero-allocation binary search.
    */
  private def sortedContains(arr: ArrayData, v: Long): Boolean = {
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val m = arr.getLong(mid)
      if (m == v) return true
      else if (m < v) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  def node2vec(walkId: Long, step: Int, nbrs: ArrayData, pnbrs: ArrayData,
      prev: java.lang.Long, p: Double, q: Double): java.lang.Long = {
    val n = nbrs.numElements()
    if (n == 0) return null
    val invP = 1.0 / p
    val invQ = 1.0 / q
    var bestK = -1.0
    var bestNb = 0L
    var i = 0
    while (i < n) {
      val b = nbrs.getLong(i)
      val dig = digest(walkId, step, b)
      // first 13 hex chars = first 52 bits of the digest, exactly the
      // conv(substring(md5, 1, 13), 16, 10) value of the fold
      var v = 0L
      var k = 0
      while (k < 13) {
        val byte = dig(k >>> 1) & 0xff
        val nib = if ((k & 1) == 0) byte >>> 4 else byte & 0xf
        v = (v << 4) | nib
        k += 1
      }
      val u = v.toDouble / 4503599627370496.0 // 2^52
      val alpha =
        if (prev != null && b == prev.longValue()) invP
        else if (pnbrs != null && sortedContains(pnbrs, b)) 1.0
        else invQ
      // Spark Round(double, 9): BigDecimal.valueOf + HALF_UP
      val key = java.math.BigDecimal.valueOf(Math.pow(u, 1.0 / alpha))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      // >= : the LAST maximal key wins, i.e. the larger nb on a tie
      // (array is ascending) — exactly max(struct(k, nb))
      if (key >= bestK) {
        bestK = key
        bestNb = b
      }
      i += 1
    }
    java.lang.Long.valueOf(bestNb)
  }
}

object WalkFunctions {
  /** Uniform derandomized neighbor pick over a sorted adjacency array. */
  def uniformWalkPick(walkId: Column, nbrs: Column, step: Int): Column =
    Bridge.column(UniformWalkPick(
      Bridge.expression(walkId), Bridge.expression(nbrs), step))

  /** node2vec-biased (p/q) derandomized neighbor pick. */
  def node2vecWalkPick(walkId: Column, nbrs: Column, pnbrs: Column,
      prev: Column, step: Int, p: Double, q: Double): Column =
    Bridge.column(Node2vecWalkPick(
      Bridge.expression(walkId), Bridge.expression(nbrs),
      Bridge.expression(pnbrs), Bridge.expression(prev), step, p, q))
}
