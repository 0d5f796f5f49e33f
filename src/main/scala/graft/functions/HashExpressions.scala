package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen signature expressions for the dedup pipeline.
  *
  * The round-1 formulation computed per-document signatures with an
  * explode + groupBy: every (doc, shingle) pair became a row, shuffled,
  * and re-aggregated — a full-corpus shuffle whose only purpose was to
  * fold shingles back into the document they came from. These
  * expressions fold inside the row instead: one fused Java loop over
  * the shingle array emits the finished signature, so signature
  * construction is a narrow map stage at ANY corpus size and the dedup
  * pipeline's first shuffle is the (much smaller) band-bucket join.
  *
  * Hashing replicates Spark's `xxhash64` bit-for-bit (seed 42,
  * iterated-hash composition for multi-argument calls), asserted
  * against the SQL formulation in HashExpressionsSpec — so the
  * expression path and the shared-shingle-pass groupBy path
  * (signaturesFromHashed, still used when one shingling feeds both the
  * candidate and the verify stage) produce identical signatures.
  */
abstract class ShingleArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
}

/** 64-bit SimHash of a shingle array: every non-null shingle votes ±1 on
  * each bit of its xxhash64; bit b of the result is set iff its vote sum
  * is positive. Matches the explode/groupBy formulation exactly
  * (including the empty-array case only when callers never produce one —
  * graft's shingleArray always emits at least one element).
  */
case class SimHash64(child: Expression) extends ShingleArrayExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val xxh = classOf[XXH64].getName
      s"""
         |int[] $votes = new int[64];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of a shingle array: `numHashes` seeded permutations
  * approximated as xxhash64(i, xxhash64(shingle)), min per slot —
  * bit-for-bit the value `min(xxhash64(lit(i), xxhash64(sh)))` the
  * groupBy formulation aggregates, with each shingle string hashed once
  * and the permutations re-hashing the 8-byte value.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends ShingleArrayExpression {
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        hs(m) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        m += 1
      }
      i += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var p = 0
    while (p < numHashes) {
      val seed = XXH64.hashInt(p, 42L)
      var j = 0
      while (j < m) {
        val v = XXH64.hashLong(hs(j), seed)
        if (v < sig(p)) sig(p) = v
        j += 1
      }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val hs = ctx.freshName("hs")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val seed = ctx.freshName("seed")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |int $n = $arr.numElements();
         |long[] $hs = new long[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $hs[$m++] = $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |  }
         |}
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $p = 0; $p < $numHashes; $p++) {
         |  long $seed = $xxh.hashInt($p, 42L);
         |  for (int $j = 0; $j < $m; $j++) {
         |    long $v = $xxh.hashLong($hs[$j], $seed);
         |    if ($v < $sig[$p]) $sig[$p] = $v;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer et al. 2003) over a token
  * array, fused into one pass: gram = k tokens joined by space, hashed
  * to an md5 hex string, window minima (lexicographic — equals any SQL
  * engine's min over the same hex strings) collected and deduped. The
  * HOF formulation (`transform`+`slice`+`array_min`) allocates a window
  * slice per position in interpreted fallback — measured 10.4 s at
  * sf0.1 vs this fused loop; the selected SET is identical, which is
  * all the downstream explode/join sees. Output order is first-window
  * occurrence (callers treat it as a set).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends ShingleArrayExpression {
  require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1, got k=$k w=$w")
  override def prettyName: String = "winnow_fingerprints"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.winnow(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      arr => s"graft.functions.WinnowFingerprints.winnow($arr, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".getBytes("US-ASCII")

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    false
  }

  /** Referenced from generated code — public, one pass, no per-window
    * allocation (the window minimum is an index scan, not a slice).
    */
  def winnow(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) =
        if (tokens.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
        else tokens.getUTF8String(i)
      i += 1
    }
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val m = if (n >= k) n - k + 1 else 1
    val md = mdLocal.get()
    val hexes = new Array[Array[Byte]](m)
    var g = 0
    while (g < m) {
      val gram =
        if (n >= k)
          org.apache.spark.unsafe.types.UTF8String.concatWs(sep,
            java.util.Arrays.copyOfRange(toks, g, g + k): _*)
        else org.apache.spark.unsafe.types.UTF8String.concatWs(sep, toks: _*)
      md.reset()
      val dig = md.digest(gram.getBytes)
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = Hex((dig(b) >> 4) & 0xf)
        hex(2 * b + 1) = Hex(dig(b) & 0xf)
        b += 1
      }
      hexes(g) = hex
      g += 1
    }
    val nw = math.max(1, m - w + 1)
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j < nw) {
      var best = hexes(j)
      var t = j + 1
      val end = math.min(j + w, m)
      while (t < end) {
        if (less(hexes(t), best)) best = hexes(t)
        t += 1
      }
      seen.add(new String(best, "US-ASCII"))
      j += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      o += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object HashFunctions {
  /** 64-bit simhash of an `array<string>` shingle column. */
  def simhash64(shingles: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(shingles)))

  /** `array<long>` minhash signature of an `array<string>` shingle column. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))

  /** `array<string>` winnowing fingerprint set of a token-array column. */
  def winnowFingerprints(tokens: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(tokens), k, w))
}
