package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<double>` columns using higher-order
  * functions (`zip_with`/`aggregate`) — fully codegen'd by Catalyst, no
  * UDF boundary, so cosine scans stay inside WholeStageCodegen at any
  * scale. Cast `array<float>` inputs with `.cast("array<double>")` first
  * so Spark and the DuckDB oracle accumulate at the same precision.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance — cheaper than cosine when vectors are
    * pre-normalized.
    */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
