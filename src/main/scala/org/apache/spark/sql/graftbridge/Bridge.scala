package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. Spark 4 hides the conversion
  * behind `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala); a subpackage of `org.apache.spark.sql` is
  * the sanctioned extension-library workaround for registering custom
  * expressions without going through the SQL function registry.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the async listener bus (bounded wait). StreamingQueryListener
    * events ride `SparkContext.listenerBus` (private[spark]) on async
    * queues; a caller reading listener-fed telemetry right after a query
    * returns must flush first or late events land on the next query.
    */
  def flushListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
