package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Statistics hygiene for DataFrame-iterative loops.
  *
  * `Dataset.localCheckpoint()` truncates the LOGICAL plan but carries the
  * original plan's estimated `Statistics` onto the resulting `LogicalRDD`
  * (`LogicalRDD.fromDataset`, ExistingRDD.scala). Catalyst's size
  * estimation is multiplicative across joins, so a loop whose round joins
  * the checkpointed state against several frames DERIVED FROM THE SAME
  * STATE compounds the estimate geometrically: the `sizeInBytes` BigInt
  * roughly x4 in BIT LENGTH per round (measured in the Louvain local-move
  * loop: 15 bits → 4M bits in 9 rounds), until every planning pass spends
  * its time in BigInteger Karatsuba/Toom-Cook multiplies of million-digit
  * integers. Loops with the classic state ⋈ invariant-edges shape only
  * grow the estimate linearly and never notice.
  *
  * [[clampStats]] rebuilds the checkpointed leaf with its carried
  * statistics clamped to Long.MaxValue — estimates stay order-of-magnitude
  * useful (anything above the clamp was astronomically wrong anyway), the
  * checkpoint's output partitioning survives untouched, and BigInt
  * arithmetic stays in the fast small-word regime.
  */
object LoopCheckpoint {
  private val Cap = BigInt(Long.MaxValue)

  /** Clamp the origin statistics of a `localCheckpoint`ed frame. No-op on
    * any other plan shape.
    */
  def clampStats(df: DataFrame): DataFrame = df.queryExecution.analyzed match {
    case l: LogicalRDD =>
      val session = df.sparkSession.asInstanceOf[ClassicSession]
      val st = l.stats
      val capped = Statistics(
        sizeInBytes = st.sizeInBytes.min(Cap),
        rowCount = st.rowCount.map(_.min(Cap)))
      Dataset.ofRows(session,
        LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
          l.isStreaming, l.stream)(session, Some(capped), None))
    case _ => df
  }
}
