package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<double>` columns. Backed by the native
  * codegen expressions in [[VectorExpressions]] — Spark's own
  * `zip_with`/`aggregate` higher-order functions are CodegenFallback
  * (interpreted lambdas + an intermediate array per call), which is fatal
  * for O(n²) similarity work. Cast `array<float>` inputs with
  * `.cast("array<double>")` first so Spark and the DuckDB oracle
  * accumulate at the same precision.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  /** Squared L2 distance — cheaper than cosine when vectors are
    * pre-normalized.
    */
  def l2sq(a: Column, b: Column): Column = VectorExpressions.l2sq(a, b)

  /** Squared L2 between `sub` and the window of `full` starting at
    * `offset` (0-based) — `l2sq(slice(full, offset+1, |sub|), sub)`
    * without the per-row slice allocation. The PQ subspace hot path.
    */
  def l2sqAt(full: Column, sub: Column, offset: Int): Column =
    VectorExpressions.l2sqAt(full, sub, offset)
}
