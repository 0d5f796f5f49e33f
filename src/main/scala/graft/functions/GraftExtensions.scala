package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions, via the
  * public `SparkSessionExtensions` hook:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     ...
  *   spark.sql("SELECT vec_cosine(a.embedding, b.embedding) ...")
  * }}}
  *
  * (or `spark.sql.extensions=graft.functions.GraftExtensions` in conf).
  * Scala callers can keep using [[VectorFunctions]] directly — this hook
  * exists so pure-SQL users get the same codegen'd operators.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def arity2(name: String, build: (Expression, Expression) => Expression)
        : Seq[Expression] => Expression = {
      case Seq(a, b) => build(a, b)
      case args => throw new IllegalArgumentException(
        s"$name requires exactly 2 arguments, got ${args.length}")
    }
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double> vectors"),
      arity2("vec_dot", DotProduct.apply)))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two array<double> vectors"),
      arity2("vec_cosine", CosineSimilarity.apply)))
    ext.injectFunction((FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance of two array<double> vectors"),
      arity2("vec_l2sq", L2Squared.apply)))
    ext.injectFunction((FunctionIdentifier("fnv64"),
      info("fnv64", "fnv64(s) - 64-bit FNV-1a content fingerprint of a string"),
      { case Seq(c) => FnvHash64(c)
        case args => throw new IllegalArgumentException(
          s"fnv64 requires exactly 1 argument, got ${args.length}") }))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(shingles) - 64-bit simhash of an array<string>"),
      { case Seq(c) => SimHash64(c)
        case args => throw new IllegalArgumentException(
          s"simhash64 requires exactly 1 argument, got ${args.length}") }))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(shingles, k) - array<long> minhash signature of an array<string>"),
      { case Seq(c, k) => MinHashSignature(c, foldToInt(k, "minhash_signature"))
        case args => throw new IllegalArgumentException(
          s"minhash_signature requires exactly 2 arguments, got ${args.length}") }))
  }

  /** The signature width must be a literal — it shapes the output schema. */
  private def foldToInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn requires a literal int signature width, got $other")
  }
}
